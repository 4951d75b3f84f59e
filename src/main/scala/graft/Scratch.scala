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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    // Plan audit of round-3 new/changed queries.
    for (q <- Seq("q11_anti_join", "q54_approx_profile", "q50_fuzzy_join")) {
      val p = SparkEntry.queries(q)(s, sfDir).queryExecution.executedPlan.toString
      val pushed = p.linesIterator.filter(_.contains("PushedFilters")).take(3).mkString(" | ")
      val joins = p.linesIterator.filter(l => l.contains("Join") || l.contains("Aggregate"))
        .map(_.trim.takeWhile(_ != '[')).take(8).mkString(" | ")
      println(s"[scratch] $q pushed: $pushed")
      println(s"[scratch] $q shape:  $joins")
    }
    spark.stop()
  }
}
