package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign every row the training shard implied
  * by the GLOBAL running total of a weight (token count) in id order —
  * `shard_id = prefix_sum_before(weight) div budget` — the offset-based
  * sharding a training-data writer needs (each shard holds ~budget tokens;
  * a document straddling a boundary stays whole in the earlier shard's
  * overflow, so assignment is deterministic and order-stable).
  *
  * The naive spelling is one window over the whole corpus ordered by id —
  * a SINGLE PARTITION holding 100 TB. This is the classic two-phase
  * distributed prefix sum instead:
  *   1. coarse buckets (`id div bucketSize`) aggregate per-bucket weight
  *      totals — one map-side-combinable shuffle;
  *   2. the global cumulative offset runs over the BUCKET TOTALS (one row
  *      per bucket — pick `bucketSize` so that's ~1e5 rows at target scale,
  *      the only single-task step, over kilobytes);
  *   3. offsets broadcast back and a window PARTITIONED BY bucket finishes
  *      the within-bucket cumsum in parallel.
  */
object ShardPack {

  /** `df` must carry unique non-negative long `idCol` and an integral
    * `weightCol`, and must not already contain the internal working names
    * or the `shard_id` output — `withColumn` would silently REPLACE a
    * caller column of the same name and corrupt the result; colliding
    * inputs fail fast instead.
    *
    * `offset` shifts the global running total's starting point — the
    * incremental hook: a caller packing batch N of a stream passes the
    * cumulative weight of batches 0..N−1, and shard ids continue exactly
    * where the previous batch stopped (a boundary-straddling shard keeps
    * filling; see [[graft.streaming.Streams.shardPackSink]]).
    */
  def assign(df: DataFrame, idCol: String, weightCol: String,
             budget: Long, bucketSize: Long = 1L << 20,
             offset: Long = 0L): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalStarts(df, idCol, weightCol, "_cum_before", bucketSize, offset)
      .withColumn("shard_id", call_function("div", col("_cum_before"), lit(budget)))
      .drop("_cum_before")
  }

  /** The primitive [[assign]] derives shard ids from, exposed (r16) for
    * consumers that need the offset itself (q113 sequence packing): each
    * row's GLOBAL running-total start — the prefix sum of `weightCol`
    * over all strictly-smaller `idCol` rows, plus `offset` — as
    * `startCol`. Same two-phase distributed prefix sum, same contracts.
    */
  def globalStarts(df: DataFrame, idCol: String, weightCol: String,
      startCol: String = "global_start", bucketSize: Long = 1L << 20,
      offset: Long = 0L): DataFrame =
    globalStartsBy(df, idCol, idCol, weightCol, startCol, bucketSize, offset)

  /** [[globalStarts]] generalized to an EXPLICIT ordering key: the prefix
    * sum runs in `(orderCol, tieCol)` order — the hook the deterministic
    * corpus shuffle (q115) needs, where the order is a seeded hash of the
    * id rather than the id itself. `orderCol` must be a non-negative
    * long; `tieCol` breaks equal-order rows into a total order (hash
    * collisions are rare but REAL at 10¹⁰ docs — without the tiebreak the
    * permutation would be nondeterministic exactly where it matters).
    * Coarse buckets come from `orderCol div bucketSize`, so equal-order
    * rows always share a bucket and the within-bucket window closes the
    * total order. For a hash-valued `orderCol` (uniform over [0, 2⁶⁰))
    * pick `bucketSize` as a hash-space WIDTH — e.g. 2⁴⁰ → ~2²⁰ buckets,
    * the same bucket-total row count the id-spelling targets.
    */
  def globalStartsBy(df: DataFrame, orderCol: String, tieCol: String,
      weightCol: String, startCol: String = "global_start",
      bucketSize: Long = 1L << 20, offset: Long = 0L): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    require(offset >= 0, s"offset must be non-negative, got $offset")
    val reserved = Seq("_bkt", "_off", "_tot", startCol, "shard_id")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns collide with ShardPack working/output names: ${clash.mkString(", ")}")
    // Column-built arithmetic, not string-spliced expr(): an idCol needing
    // more than backtick quoting can't break the parse. `div` is the
    // registry's IntegralDivide — exact bigint division (a double `/` +
    // cast would silently mis-bucket ids past 2^53).
    val w = df.withColumn("_bkt", call_function("div", col(orderCol), lit(bucketSize)))
    val offsets = w.groupBy(col("_bkt")).agg(sum(col(weightCol)).as("_tot"))
      .withColumn("_off",
        coalesce(sum(col("_tot")).over(
          Window.orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_bkt"), col("_off"))
    val inBkt = Window.partitionBy(col("_bkt"))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    w.join(broadcast(offsets), Seq("_bkt"))
      .withColumn(startCol,
        lit(offset) + col("_off") + coalesce(sum(col(weightCol)).over(inBkt), lit(0L)))
      .drop("_bkt", "_off")
  }
}
