package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch state (Apache DataSketches HLL via
  * Spark's built-in `hll_sketch_agg` family) — the pre-aggregation
  * discipline for COUNT DISTINCT at 100 TB: a per-partition (per day,
  * per source) sketch column is tiny (≤ 2^lgK registers), additive
  * across partitions, and never needs the raw keys again. Exact
  * `countDistinct` by contrast must reshuffle every distinct key on
  * every refresh — the q49 shape, correct but unmaintainable
  * incrementally.
  *
  * Pairs with the q62 incremental-refresh algebra: daily sketch states
  * are merged (`unionEstimate`) instead of rescanning history, exactly
  * like the (count, sum) partials — the union of sub-sketches carries
  * the SAME register state a one-pass sketch would (spec-asserted), so
  * incremental and full builds agree estimate-for-estimate.
  */
object Sketches {

  /** Per-group sketch state: one binary sketch column per group.
    * `lgK` trades memory (2^lgK registers) for accuracy (~1.04/√2^lgK
    * relative error — lgK 14 ≈ 0.8%).
    */
  def sketchState(df: DataFrame, groupCols: Seq[String], keyCol: String,
      lgK: Int = 14, as: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as(as))

  /** Merge sketch states (e.g. daily → monthly, per-source → global) and
    * estimate: the incremental-refresh read path.
    */
  def unionEstimate(state: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch", as: String = "approx_distinct"): DataFrame = {
    val merged = hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false))).as(as)
    if (groupCols.isEmpty) state.agg(merged)
    else state.groupBy(groupCols.map(col): _*).agg(merged)
  }
}
