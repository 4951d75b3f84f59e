package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink writers (i04): partitioned parquet with the three write disciplines
  * the reference uses — append-only (silver_settlements), full refresh
  * (gold dims/facts), and dynamic partition overwrite (incremental
  * re-statements that must not clobber untouched partitions).
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
