package graft

import org.apache.spark.sql.SparkSession

/** Dev-only component profiler (not part of the driver contract): warms
  * then measures the catalog (optionally filtered by SPARK_GRAFT_QUERIES)
  * with per-query timing lines, in the same session shape as Bench.
  */
object Scratch {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    for (q <- SparkEntry.queries.keys.toSeq.sorted if only.forall(_.contains(q)))
      time(s"warm $q") { SparkEntry.queries(q)(s, "/root/testdata/sf0.001").count() }
    for (q <- SparkEntry.queries.keys.toSeq.sorted if only.forall(_.contains(q)))
      time(s"MEAS $q") { SparkEntry.queries(q)(s, sfDir).count() }
    spark.stop()
  }
}
