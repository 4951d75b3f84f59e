package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    // SimHash wide-form plan: expect ONE Exchange under the fingerprint agg
    // (plus the banded self-join exchanges), broadcast for the vocab join.
    val fp = graft.text.SimHash.fingerprints(Tables.documents(s, sfDir), "doc_id", "text")
    val fpPlan = fp.queryExecution.executedPlan.toString
    println("[scratch] simhash exchanges=" +
      fpPlan.linesIterator.count(_.contains("Exchange")) +
      " broadcasts=" + fpPlan.linesIterator.count(_.contains("BroadcastExchange")))

    // q50 candidate volume: tiling-only vs tiling+deletion blocking.
    val c = Tables.customer(s, sfDir)
    val batch = c.filter(col("c_custkey") % 100 === 0)
    val master = c.filter(col("c_custkey") % 100 =!= 0)
    val linked = graft.ops.FuzzyLink.linkage(batch, master, "c_custkey", "c_name", 9, 2)
    println(s"[scratch] q50 pairs=${time("q50 linkage")(linked.count())}")
    spark.stop()
  }
}
