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
    // SimHash fingerprint group-split variants (groups × bitsPerGroup = 60).
    import graft.text.TextFunctions
    def fpVariant(groups: Int): Long = {
      val bits = 60 / groups
      val docs = Tables.documents(s, sfDir)
      val tf = docs
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val vocab = tf.select(col("tok")).distinct()
        .withColumn("h", TextFunctions.hash60(col("tok")))
      val sums = (0 until bits).map(j =>
        sum((expr(s"(h >> (g * $bits + $j)) & 1") * 2 - 1) * col("tf")).as(s"_s$j"))
      val partial = (0 until bits)
        .map(j => when(col(s"_s$j") > 0,
          expr(s"shiftleft(cast(1 as bigint), g * $bits + $j)")).otherwise(lit(0L)))
        .reduce(_ + _)
      tf.join(broadcast(vocab), "tok")
        .select(col("doc_id"), col("tf"), col("h"),
          explode(sequence(lit(0), lit(groups - 1))).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), partial.as("part"))
        .groupBy(col("doc_id"))
        .agg(sum(col("part")).as("simhash"))
        .count()
    }
    for (g <- Seq(6, 4, 3, 2, 1); run <- 1 to 2)
      time(s"simhash fp g=$g run$run")(fpVariant(g))
    time("q22 full run1")(SparkEntry.queries("q22_simhash")(s, sfDir).count())
    time("q22 full run2")(SparkEntry.queries("q22_simhash")(s, sfDir).count())
    spark.stop()
  }
}
