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
  *
  * The right value columns are carried as ONE struct with a single
  * `last(ignoreNulls)` — carrying them independently would let a right row
  * with a NULL in one column silently inherit that column from an OLDER
  * quote, stitching values from different right rows. The struct wrapper is
  * non-null whenever the right row exists, so the carry is row-atomic and
  * NULL fields propagate as the matched row's NULLs.
  */
object AsOf {

  /** Internal tag columns; the inputs must not use these names. */
  private val Reserved = Seq("_gts", "_gside", "_gvals")

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val rVals = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    val lCols = left.columns.toSeq
    require(rVals.intersect(lCols).isEmpty, s"overlapping value columns: ${rVals.intersect(lCols)}")
    val clash = (lCols ++ right.columns).distinct.intersect(Reserved)
    require(clash.isEmpty, s"reserved column names in input: ${clash.mkString(", ")}")

    val valsType = org.apache.spark.sql.types.StructType(
      rVals.map(c => right.schema(c).copy(name = c)))
    val lTagged = left
      .select(Seq(col(leftTs).as("_gts"), lit(1).as("_gside"),
        lit(null).cast(valsType).as("_gvals")) ++ lCols.map(col): _*)
    val rTagged = right
      .select(Seq(col(rightTs).as("_gts"), lit(0).as("_gside"),
        struct(rVals.map(col): _*).as("_gvals")) ++
        lCols.map(c => if (c == key) col(key)
                       else lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("_gts"), col("_gside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(lCols.map(col) :+
        last(col("_gvals"), ignoreNulls = true).over(w).as("_gvals") :+
        col("_gside"): _*)
      .filter(col("_gside") === 1)
      .select(lCols.map(col) ++ rVals.map(c => col("_gvals").getField(c).as(c)): _*)
  }
}
