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
    * partitions). This is the two-phase distributed rank:
    *
    *   1. range-partition + sort by (group ++ order) — chunk size tracks
    *      data/partitions, NOT group cardinality;
    *   2. pass 1 over the sorted partitions: per-(partition, group) row
    *      counts → driver (bounded BY `maxGroups`: each partition fails
    *      fast with a named error past `maxGroups` distinct keys, so the
    *      driver payload is ≤ partitions × maxGroups — this operator is
    *      FOR coarse, catalog-cardinality group keys; fine keys belong in
    *      the ordinary window, whose partitions are then small by
    *      definition. Binary-typed group columns are rejected up front:
    *      they would compare by reference in the count maps);
    *   3. pass 2 over the SAME partitions: global rank = broadcast offset
    *      + running local count, and the tile follows Spark's exact ntile
    *      distribution (first n%t tiles hold ceil(n/t) rows, the rest
    *      floor(n/t)).
    *
    * Deliberately the RDD two-pass, NOT a DataFrame self-reference: a
    * DataFrame spelling that references the range-partitioned frame twice
    * (bucket-count branch + rank branch) plans TWO independent range
    * exchanges — `ReuseExchange` does not fire because column pruning
    * specializes the copies — and each exchange draws its OWN
    * RangePartitioner sample, so a row near a boundary can land in bucket
    * b on one side and b+1 on the other: silently wrong ranks, and only
    * at scale (small data is sampled exhaustively, so tests pass).
    * Holding ONE RDD makes pass 2 reuse pass 1's shuffle files — bucket
    * assignment is consistent BY CONSTRUCTION. (This is guideline tier
    * (d), mapPartitions, taken because the declarative spelling is
    * provably unsound here.)
    *
    * `order` must be a TOTAL order (include a unique tiebreak): ties
    * spanning a range-partition boundary would otherwise make bucket
    * membership — and the rank — nondeterministic. Output = input columns
    * + `tileCol` (int). Rows identical to `ntile(tiles) over (partition
    * by group order by order)` — property-pinned against the window
    * spelling, including pruning-divergent payload columns.
    */
  def ntileDistributed(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      tiles: Int, tileCol: String = "tile", buckets: Int = 0,
      maxGroups: Int = 10000): DataFrame = {
    require(tiles >= 1, s"tiles must be positive, got $tiles")
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val clash = df.columns.toSeq.intersect(Seq(tileCol))
    require(clash.isEmpty,
      s"input columns collide with ntileDistributed output: ${clash.mkString(", ")}")
    require(maxGroups >= 1, s"maxGroups must be positive, got $maxGroups")
    // Group keys are compared as Seq[Any] from Row.get: binary columns would
    // fall back to Array reference equality and silently split every group.
    groupCols.foreach { c =>
      def hasBinary(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.BinaryType => true
        case a: org.apache.spark.sql.types.ArrayType => hasBinary(a.elementType)
        case m: org.apache.spark.sql.types.MapType =>
          hasBinary(m.keyType) || hasBinary(m.valueType)
        case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasBinary(f.dataType))
        case _ => false
      }
      val dt = df.schema(c).dataType
      require(!hasBinary(dt),
        s"ntileDistributed: group column '$c' has binary type $dt; binary keys " +
          "compare by reference in the per-partition count maps — hash the " +
          "column to a string/long first, or use the ordinary window ntile")
    }
    val spark = df.sparkSession
    val p = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions
    val sortCols = groupCols.map(col) ++ order
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val rdd = sorted.rdd // ONE instance: pass 2 reuses pass 1's shuffle
    // pass 1: per-(partition, group) counts — bounded driver metadata
    val partCounts: Array[(Int, Seq[(Seq[Any], Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        it.foreach { r =>
          val k = gIdx.map(r.get)
          m.update(k, m.getOrElse(k, 0L) + 1L)
          // Fail in the EXECUTOR, before the driver collect: the bound is
          // per partition, so the collected metadata is ≤ partitions ×
          // maxGroups keys by construction — a fine-grained key dies with a
          // named error instead of a silent driver OOM.
          if (m.size > maxGroups) throw new IllegalArgumentException(
            s"ntileDistributed: more than $maxGroups distinct group keys in " +
              s"one range partition (group cols ${groupCols.mkString(", ")}). " +
              "This operator is for coarse, catalog-cardinality group keys; " +
              "for fine keys use the ordinary window ntile, whose partitions " +
              "are then small by definition. Raise maxGroups only if the " +
              "driver can hold partitions x maxGroups keys.")
        }
        Iterator.single((pid, m.toSeq))
      }.collect()
    val totals = scala.collection.mutable.HashMap[Seq[Any], Long]()
    // offsets(pid)(key) = rows of `key` in partitions before pid
    val offsets: Map[Int, Map[Seq[Any], Long]] =
      partCounts.sortBy(_._1).map { case (pid, counts) =>
        val off = counts.map { case (k, n) =>
          val prior = totals.getOrElse(k, 0L)
          totals.update(k, prior + n)
          k -> prior
        }.toMap
        pid -> off
      }.toMap
    val totalsB = spark.sparkContext.broadcast(totals.toMap)
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val t = tiles.toLong
    val tiled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap[Seq[Any], Long]()
      val off = offsetsB.value.getOrElse(pid, Map.empty)
      it.map { r =>
        val k = gIdx.map(r.get)
        val rank0 = off.getOrElse(k, 0L) + local.getOrElse(k, 0L)
        local.update(k, local.getOrElse(k, 0L) + 1L)
        val n = totalsB.value(k)
        val base = n / t
        val rem = n % t
        val tile = if (rank0 < (base + 1L) * rem) rank0 / (base + 1L) + 1L
                   else rem + (rank0 - (base + 1L) * rem) / base + 1L
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ tile.toInt)
      }
    }
    spark.createDataFrame(tiled,
      schema.add(org.apache.spark.sql.types.StructField(
        tileCol, org.apache.spark.sql.types.IntegerType, nullable = false)))
  }
}
