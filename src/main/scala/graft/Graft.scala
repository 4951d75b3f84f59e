package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession builder pre-configured the way every
  * graft surface (Verify, Bench, tests) runs — native function extensions
  * registered, AQE on with size-first coalescing and skew handling, UTC
  * session timezone, and the nanos-timestamp legacy flag the testdata
  * needs. Callers on a real cluster pass their own master/shuffle settings.
  */
object Graft {

  def builder(master: String = "local[*]", shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // STATIC conf, default 100 — far too small for a wide query catalog
      // in one session; evictions trigger janino recompilation mid-run.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    shufflePartitions.fold(b)(n => b.config("spark.sql.shuffle.partitions", n))
  }

  def session(master: String = "local[*]", shufflePartitions: Option[Int] = None): SparkSession =
    builder(master, shufflePartitions).getOrCreate()
}
