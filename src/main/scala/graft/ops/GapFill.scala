package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill: calendar densify + zero-fill + LOCF — the
  * resample shape a bucket aggregation can't produce, because buckets with
  * NO rows must EXIST downstream (reference analog: the gold-layer daily
  * fact aggregations — reference: 5_gold/fact_transaction.py — read as a
  * dense series: a reporting day with no transactions must still appear).
  *
  * Per-key calendar = `sequence(min_day, max_day)` exploded, so row count
  * is keys × their own span — never a global calendar cross join. LOCF is
  * one ignoreNulls `last()` window per key ordered by day.
  *
  * `maxSpanDays` is the bad-data guard: ONE corrupted epoch-zero
  * timestamp otherwise hands its key a ~20k-element calendar array (and a
  * year-0001 one errors the job deep inside `sequence` at Spark's array
  * cap). A key whose min→max span exceeds the bound raises a NAMED error
  * carrying the key and its span — a diagnosis pointing at the poisoned
  * row, instead of a stack trace (or worse, a silently enormous output).
  * The guard rides the same `when` that builds the calendar, so it cannot
  * be pruned away and costs nothing on clean data.
  */
object GapFill {

  /** Densify `daily` (one row per (key, day) with a value) to every day in
    * each key's [min, max] range. Output columns: `keyCol`, `dayCol`,
    * `valCol` (zero-filled), `<valCol>_locf` (last observation carried
    * forward). `daily` must be pre-aggregated to one row per (key, day).
    */
  def dense(daily: DataFrame, keyCol: String, dayCol: String, valCol: String,
      maxSpanDays: Int = 3700): DataFrame = {
    require(maxSpanDays > 0, s"maxSpanDays must be positive, got $maxSpanDays")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val span = datediff(col("_hi"), col("_lo"))
    val cal = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("_lo"), max(col(dayCol)).as("_hi"))
      // explode_outer + null filter (the MinHash.shingleRows dodge): plain
      // explode infers a size()>0 filter rebuilding the calendar sequence
      // (and re-evaluating the guard) per key in an interpreted Filter.
      .select(col(keyCol),
        explode_outer(when(span > maxSpanDays,
            raise_error(concat(
              lit(s"gap_fill: key "), col(keyCol).cast("string"),
              lit(" spans "), span.cast("string"),
              lit(s" days (> max $maxSpanDays) from "), col("_lo").cast("string"),
              lit(" — corrupt timestamp?"))))
          .otherwise(sequence(col("_lo"), col("_hi")))).as(dayCol))
      .filter(col(dayCol).isNotNull)
    cal.join(daily, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        coalesce(col(valCol), lit(0.0)).as(valCol),
        last(col(valCol), ignoreNulls = true).over(w).as(valCol + "_locf"))
  }
}
