package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed / time-series operators generalizing the reference's recency
  * logic (reference: 4_silver/silver_transactions.py:108) into the standard
  * analytics toolbox: top-N per group, gap sessionization, running totals,
  * tumbling time buckets.
  *
  * All single-shuffle: hash-partition by the group key, evaluate windows
  * within partitions.
  */
object Windows {

  /** Top `n` rows per group under `order` (include a unique tiebreak). Keeps
    * the rank as `rankCol`.
    */
  def topNPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int,
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Gap-based sessionization: a new session starts when the gap since the
    * previous event (by `ts`, tiebreak `tiebreak`) exceeds `gap`. Adds
    * `session_seq` (1-based per key). The streaming analog is
    * [[graft.streaming.Streams.sessionize]].
    */
  def sessionize(df: DataFrame, keys: Seq[String], ts: Column, tiebreak: Column,
      gap: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts, tiebreak)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull || ts - prev > expr(s"INTERVAL $gap"), 1).otherwise(0)
    df.withColumn("_graft_new", isNew)
      .withColumn("session_seq",
        sum(col("_graft_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_graft_new")
  }

  /** Running total of `value` per key in `ts, tiebreak` order (the banking
    * running-balance shape).
    */
  def runningTotal(df: DataFrame, keys: Seq[String], ts: Column, tiebreak: Column,
      value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts, tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(value).over(w))
  }

  /** Tumbling bucket column for time aggregation (batch equivalent of a
    * streaming window; see graft.streaming.Streams.windowedAgg).
    */
  def timeBucket(ts: Column, unit: String): Column = date_trunc(unit, ts)
}
