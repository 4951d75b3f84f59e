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

    val slow = Seq("q22_simhash", "q56_tfidf", "q55_kmeans_cells",
      "q39_dup_clusters", "q53_funnel", "q38_range_join",
      "q20_ngram_jaccard", "q21_minhash_lsh", "q50_fuzzy_join")

    // Bench-style warmup: one uncounted pass at sf0.001.
    for (q <- slow)
      time(s"warm $q") { SparkEntry.queries(q)(s, "/root/testdata/sf0.001").count() }

    // Measured pass at sfDir, family order as in Bench (sorted).
    for (q <- slow.sorted)
      time(s"MEAS $q") { SparkEntry.queries(q)(s, sfDir).count() }

    // ---- q39 decomposition: edges vs CC rounds ----
    {
      import graft.text.{MinHash, TextFunctions => TF}
      val sh = MinHash.withShingles(Tables.documents(s, sfDir), "doc_id", "text")
      val sig = MinHash.signature(MinHash.shingleRows(sh, "doc_id"), "doc_id", 16)
      val cand = MinHash.candidates(MinHash.bands(sig, "doc_id", 4, 2), "doc_id")
      val edges = MinHash.jaccard(sh, cand, "doc_id")
        .filter(col("jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      val mat = time("q39 edges materialize") { edges.localCheckpoint() }
      time("q39 cc over materialized") {
        graft.ops.Graph.connectedComponents(mat, "id_a", "id_b").count()
      }
    }

    // ---- q55 decomposition: seed loop vs lloyd ----
    {
      import graft.sim.Ann
      val v = Tables.embeddings(s, sfDir)
        .select(col("vec_id").as("id"), Ann.toDouble(col("embedding")).as("vec"))
      val base = time("q55 base checkpoint") { v.localCheckpoint() }
      println(s"[scratch] q55 corpus rows = ${base.count()}")
      time("q55 full kmeansCells") { Ann.kmeansCells(base, 4, 2).count() }
    }
    spark.stop()
  }
}
