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

    val docs = Tables.documents(s, sfDir)
    val sh = MinHash.withShingles(docs, "doc_id", "text")
    val sig = MinHash.signature(MinHash.shingleRows(sh, "doc_id"), "doc_id", 4)
    val cand = MinHash.candidates(MinHash.bands(sig, "doc_id", 4, 2), "doc_id")
    val edges = MinHash.jaccard(sh, cand, "doc_id")
      .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      .localCheckpoint()
    println("[scratch] n_edges=" + edges.count())
    for (it <- Seq(1, 2, 3, 20)) {
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.connectedComponents(edges, "id_a", "id_b", maxIter = it)
        .agg(sum(col("label"))).head.get(0)
      println(f"[scratch] maxIter=$it%-3d labelSum=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
