package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each left row picks up the most recent right row
  * with `rightTs <= leftTs` for the same key — the FX-rate-at-transaction-
  * time semantics of the reference's settlement enrichment
  * (reference: 5_gold/fact_settlement.py fx_rate_used), generalized to a
  * first-class operator Spark lacks.
  *
  * Implementation is union + last-non-null window, NOT a theta join:
  * both sides are tagged, unioned, and hash-partitioned by key once; a
  * running `last(value, ignoreNulls)` ordered by (ts, side) carries the
  * latest quote forward into each left row. Right rows sort before left
  * rows at equal timestamps, so a quote stamped exactly at the event time
  * matches (>= semantics, as DuckDB's ASOF JOIN).
  *
  * Scale: one shuffle on the key, O(n log n) per partition, no per-key
  * row explosion — the naive `l JOIN r ON l.k = r.k AND r.ts <= l.ts`
  * materializes O(|l| × |r|) rows per key before the argmax. Skewed keys
  * degrade to a sort, not a cross product.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate otherwise
  * (ambiguous quotes have no deterministic winner in any engine).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val rVals = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    val lCols = left.columns.toSeq
    require(rVals.intersect(lCols).isEmpty, s"overlapping value columns: ${rVals.intersect(lCols)}")

    val lTagged = left
      .select(Seq(col(leftTs).as("_gts"), lit(1).as("_gside")) ++
        lCols.map(col) ++
        rVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .select(Seq(col(rightTs).as("_gts"), lit(0).as("_gside")) ++
        lCols.map(c => if (c == key) col(key)
                       else lit(null).cast(left.schema(c).dataType).as(c)) ++
        rVals.map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("_gts"), col("_gside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(lCols.map(col) ++
        rVals.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
        col("_gside"): _*)
      .filter(col("_gside") === 1)
      .drop("_gside")
  }
}
