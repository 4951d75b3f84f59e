package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.MinHash

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
    SparkEntry.queries("q06_star_agg")(s, sfDir).count() // warmup

    // Does Observation fire on a localCheckpoint action?
    {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val obs = org.apache.spark.sql.Observation()
      spark.range(100).observe(obs, sum(col("id")).as("s")).localCheckpoint()
      val r = try Await.result(Future(obs.get), 3.seconds).toString
              catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }
      println(s"[scratch] obs-on-localCheckpoint = $r")
    }
    // q50 sf0.1 completeness check
    println(s"[scratch] q50 sf0.1 rows = " + SparkEntry.queries("q50_fuzzy_join")(s, sfDir).count())
    // IVF recall@3 vs brute force at sf0.01, by nprobe.
    import graft.sim.Ann
    val d01 = "/root/testdata/sf0.01"
    val v = Tables.embeddings(s, d01)
      .select(col("vec_id").as("id"), Ann.toDouble(col("embedding")).as("vec"), col("label"))
    val queries = v.filter(col("id") < 50)
    val exact = Ann.bruteforceTopK(v, queries, 3)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    for (np <- Seq(2, 3, 4, 5)) {
      val r = exact.join(Ann.ivfTopK(v, queries, np, 3)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count().toDouble / nExact
      println(f"[scratch] ivf recall@3 nprobe=$np%d  $r%.3f")
    }
    // approx_percentile vs DuckDB quantile_disc parity probe
    Tables.orders(s, d01)
      .groupBy(col("o_orderstatus"))
      .agg(expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 1000000)").as("q"))
      .orderBy("o_orderstatus")
      .collect().foreach(r => println(s"[scratch] apct ${r.getString(0)} ${r.getSeq[Double](1)}"))
    spark.stop()
  }
}
