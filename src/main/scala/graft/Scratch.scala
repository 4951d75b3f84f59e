package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    import graft.text.{TextFunctions => TF}

    def tfFrame(d: String) = Tables.documents(s, d)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))

    def finish(tf: DataFrame): Long = {
      val dfreq = tf.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
      val n = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
      tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("score", round(col("tf") * log(col("n_docs") * lit(1.0) / col("df")), 4))
        .withColumn("term_rank", row_number().over(w))
        .filter(col("term_rank") <= 3)
        .select(col("doc_id"), col("term_rank"), col("tok").as("term"), col("score"))
        .count()
    }

    // window variant: df via count over tok-partition (tf is distinct per
    // (doc, tok)); n_docs still needs one tiny agg over tf.
    def finishWindow(tf: DataFrame): Long = {
      val wTok = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
      val n = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
      tf.withColumn("df", count(lit(1)).over(wTok))
        .crossJoin(broadcast(n))
        .withColumn("score", round(col("tf") * log(col("n_docs") * lit(1.0) / col("df")), 4))
        .withColumn("term_rank", row_number().over(w))
        .filter(col("term_rank") <= 3)
        .select(col("doc_id"), col("term_rank"), col("tok").as("term"), col("score"))
        .count()
    }

    // warm all three shapes at sf0.001
    time("warm nocache") { finish(tfFrame("/root/testdata/sf0.001")) }
    time("warm cache") { val t = tfFrame("/root/testdata/sf0.001").cache(); finish(t); t.unpersist() }
    time("warm window") { finishWindow(tfFrame("/root/testdata/sf0.001")) }
    for (rep <- 1 to 3) {
      time(s"q56 nocache rep$rep") { finish(tfFrame(sfDir)) }
      time(s"q56 cache   rep$rep") {
        val t = tfFrame(sfDir).cache()
        try finish(t) finally t.unpersist()
      }
      time(s"q56 ckpt    rep$rep") { finish(tfFrame(sfDir).localCheckpoint()) }
      time(s"q56 window  rep$rep") { finishWindow(tfFrame(sfDir)) }
    }
    spark.stop()
  }
}
