package graft

import org.apache.spark.sql.SparkSession

/** Dev-only component profiler (not part of the driver contract). */
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
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    for (q <- Seq("q20_ngram_jaccard", "q21_minhash_lsh"))
      time(s"warm $q") { SparkEntry.queries(q)(s, "/root/testdata/sf0.001").count() }
    time("q20 sf0.1") { SparkEntry.queries("q20_ngram_jaccard")(s, sfDir).count() }
    for (i <- 1 to 5)
      time(s"q21 sf0.1 rep$i") { SparkEntry.queries("q21_minhash_lsh")(s, sfDir).count() }
    spark.stop()
  }
}
