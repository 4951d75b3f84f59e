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

    // Dedup family decomposition at sf0.1.
    val docs = Tables.documents(s, sfDir)
    time("q19 dedup_exact")(SparkEntry.queries("q19_dedup_exact")(s, sfDir).count())
    val sh = MinHash.withShingles(docs, "doc_id", "text")
    time("shingles explode count")(
      MinHash.shingleRows(sh, "doc_id").count())
    val rows = MinHash.shingleRows(sh, "doc_id")
    val sig = MinHash.signature(rows, "doc_id", 16)
    time("signature k=16 build")(sig.count())
    val cand = MinHash.candidates(MinHash.bands(sig, "doc_id", 16, 2), "doc_id")
    time("bands+candidates")(cand.count())
    time("jaccard verify")(MinHash.jaccard(sh, cand, "doc_id").count())
    time("q20 full")(SparkEntry.queries("q20_ngram_jaccard")(s, sfDir).count())
    time("q21 full")(SparkEntry.queries("q21_minhash_lsh")(s, sfDir).count())
    time("q20 again")(SparkEntry.queries("q20_ngram_jaccard")(s, sfDir).count())
    spark.stop()
  }
}
