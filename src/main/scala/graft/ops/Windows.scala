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

  /** Exact `ntile(tiles)` per COARSE group without a group-sized window
    * partition. `ntile over (partition by segment)` hands each segment —
    * corpus/|segments| rows for a coarse key like market segment — to one
    * task's sorted buffer, the same hot-key hazard class as
    * first-occurrence dedup's old window (and AQE cannot split window
    * partitions). This is the ShardPack two-phase prefix discipline
    * applied to RANKS over an arbitrary total order:
    *
    *   1. per-group totals: one map-side-combinable aggregation,
    *      group-cardinality rows, broadcast;
    *   2. rows range-partition by (group ++ order) into `buckets` chunks —
    *      chunk size tracks data/buckets, NOT group cardinality;
    *   3. per-(bucket, group) counts roll into bucket OFFSETS with a
    *      window over the bucket×group count table (bounded metadata, the
    *      only narrow step), broadcast;
    *   4. within-bucket `row_number` (partition = one bucket's slice of
    *      one group) + offset = the exact global rank, and the tile
    *      follows from Spark's ntile distribution: the first n%t tiles
    *      hold ceil(n/t) rows, the rest floor(n/t).
    *
    * `order` must be a TOTAL order (include a unique tiebreak): ties
    * spanning a range-partition boundary would otherwise make bucket
    * membership — and the rank — nondeterministic. Output = input columns
    * + `tileCol`. Rows identical to `ntile(tiles) over (partition by
    * group order by order)` — property-pinned against the window spelling.
    */
  def ntileDistributed(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      tiles: Int, tileCol: String = "tile", buckets: Int = 0): DataFrame = {
    require(tiles >= 1, s"tiles must be positive, got $tiles")
    val reserved = Seq("_bkt", "_boff", "_bn", "_n", "_rank0", tileCol)
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns collide with ntileDistributed working/output names: ${clash.mkString(", ")}")
    val spark = df.sparkSession
    val p = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions
    val gCols = groupCols.map(col)
    val totals = df.groupBy(gCols: _*).agg(count(lit(1)).as("_n"))
    val ranged = df
      .repartitionByRange(p, gCols ++ order: _*)
      .withColumn("_bkt", spark_partition_id())
    val bktCounts = ranged.groupBy((col("_bkt") +: gCols): _*)
      .agg(count(lit(1)).as("_bn"))
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bktCounts
      .withColumn("_boff", coalesce(sum(col("_bn")).over(wOff), lit(0L)))
      .select((col("_bkt") +: gCols :+ col("_boff")): _*)
    val wIn = Window.partitionBy((col("_bkt") +: gCols): _*).orderBy(order: _*)
    val base = call_function("div", col("_n"), lit(tiles.toLong))
    val rem = col("_n") % tiles
    val rank0 = col("_boff") + row_number().over(wIn) - 1
    // when base == 0 (fewer rows than tiles) every rank satisfies the
    // first branch, so the base-divide branch never evaluates.
    val tile = when(rank0 < (base + 1) * rem,
        call_function("div", rank0, base + 1) + 1)
      .otherwise(rem + call_function("div", rank0 - (base + 1) * rem, base) + 1)
    ranged
      .join(broadcast(offsets), "_bkt" +: groupCols)
      .join(broadcast(totals), groupCols)
      .withColumn(tileCol, tile.cast("int"))
      .drop("_bkt", "_boff", "_n")
  }
}
