package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Sink writers (i04): partitioned parquet with the three write disciplines
  * the reference uses — append-only (silver_settlements), full refresh
  * (gold dims/facts), and dynamic partition overwrite (incremental
  * re-statements that must not clobber untouched partitions) — plus an
  * ATOMIC full refresh ([[overwriteAtomic]]) standing in for the
  * reference's transactional Delta table writes
  * (reference: 4_silver/silver_transactions.py MERGE INTO ... USING DELTA).
  */
object Sinks {

  def append(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit =
    write(df, path, "append", partitionCols)

  def overwrite(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit =
    write(df, path, "overwrite", partitionCols)

  /** Overwrite only the partitions present in `df` (requires
    * spark.sql.sources.partitionOverwriteMode=dynamic, set per-write here so
    * the session default stays untouched).
    */
  def dynamicOverwrite(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Full refresh that never destroys the current table copy mid-write:
    * the frame is written to a temp directory NEXT TO `path`, then swapped
    * in with two renames (current → retired, temp → current) and the
    * retired copy deleted. A crash during the write leaves the live table
    * untouched (plus temp garbage); a crash between the renames leaves the
    * complete old copy under `<path>.__old-*` for manual recovery — at no
    * point is the only copy a half-written directory, which is exactly the
    * failure mode of Spark's plain `mode("overwrite")` (delete, then
    * rewrite in place). Directory rename is atomic on HDFS-like
    * filesystems; object stores need a manifest-based commit (Delta /
    * Iceberg) instead, which is what the reference leans on.
    */
  def overwriteAtomic(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val fs = new Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$path.__tmp-$token")
    val old = new Path(s"$path.__old-$token")
    val live = new Path(path)
    try {
      write(df, tmp.toString, "overwrite", partitionCols)
      if (fs.exists(live)) {
        if (!fs.rename(live, old)) sys.error(s"rename $live -> $old failed")
      }
      if (!fs.rename(tmp, live)) sys.error(s"rename $tmp -> $live failed")
      fs.delete(old, true)
    } finally fs.delete(tmp, true)
  }

  private def write(df: DataFrame, path: String, mode: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** ORC writer (see Sources.orc). */
  def orc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Bucketed + sorted catalog table (i05): co-locates and pre-sorts rows by
    * the join key at WRITE time, so repeated large-fact joins on that key
    * run shuffle-free (SortMergeJoin with no Exchange under it) — the
    * pre-partitioning discipline a 100 TB fact table needs when it is
    * joined on the same key by every downstream query. Bucket count should
    * match the target parallelism (it is fixed at write time).
    */
  def bucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
