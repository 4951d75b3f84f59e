package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only step profiler (not part of the driver contract): ad-hoc
  * decompositions of expensive catalog queries into their component jobs,
  * timed in the same session shape as Bench. Select a profile by arg.
  */
object Prof {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
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
    val which = if (args.nonEmpty) args(0) else "q67"
    which match {
      case "q67" => q67(spark, sfDir)
      case "q76" => q76(spark, sfDir)
      case other => System.err.println(s"unknown profile $other")
    }
    spark.stop()
  }

  def q76(spark: SparkSession, d: String): Unit = {
    // warm at sf0.001
    SparkEntry.queries("q76_copurchase")(spark, "/root/testdata/sf0.001").count()
    Graft.releaseCaches(); spark.catalog.clearCache()
    (1 to 3).foreach { rep =>
      println(s"== rep $rep ==")
      val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
      time("scan count") { li.count() }
      val wide = graft.sources.Sources.widen(li, col("l_orderkey"))
      val ps = slice(array_sort(collect_set(col("l_partkey"))), 1, 64)
      val baskets = wide.groupBy(col("l_orderkey")).agg(ps.as("_ps"))
      time("baskets (noop)") {
        baskets.write.format("noop").mode("overwrite").save() }
      val pairs = graft.ops.Baskets.pairsOfSets(baskets, "l_orderkey")
      time("pairs (noop)") {
        pairs.write.format("noop").mode("overwrite").save() }
      val counted = pairs.groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_baskets"))
      time("pair counts (noop)") {
        counted.write.format("noop").mode("overwrite").save() }
      time("full q76 (count)") {
        SparkEntry.queries("q76_copurchase")(spark, d).count() }
      // v_b: cut the plan at baskets (localCheckpoint) so the pair
      // expansion + count stage reads codegen-friendly input
      val ck = time("baskets localCheckpoint") { baskets.localCheckpoint() }
      val countedCk = graft.ops.Baskets.pairsOfSets(ck, "l_orderkey")
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_baskets"))
      time("v_b pairs+count off checkpoint") {
        countedCk.write.format("noop").mode("overwrite").save() }
      // v_c: join-based pair expansion off the checkpointed baskets
      val ex = ck.select(col("l_orderkey"), posexplode(col("_ps")).as(Seq("i", "item")))
      val cj = ex.select(col("l_orderkey"), col("i").as("ia"), col("item").as("item_a"))
        .join(ex.select(col("l_orderkey"), col("i").as("ib"), col("item").as("item_b")),
          Seq("l_orderkey"))
        .filter(col("ia") < col("ib"))
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_baskets"))
      time("v_c join pairs+count off checkpoint") {
        cj.write.format("noop").mode("overwrite").save() }
      Graft.releaseCaches(); spark.catalog.clearCache()
    }
  }

  def q67(spark: SparkSession, d: String): Unit = {
    import graft.text.{MinHash, TextFunctions}
    val id = "doc_id"
    // warm at sf0.001
    SparkEntry.queries("q67_containment")(spark, "/root/testdata/sf0.001").count()
    Graft.releaseCaches(); spark.catalog.clearCache()
    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      val docs = Tables.documents(spark, d)
      time("docs.count") { docs.count() }
      val sh = MinHash.withShingles(docs, id, "text")
      time("withShingles count") { sh.count() }
      val ex = sh.select(col(id), explode(col("shingles")).as("_s"))
      val nex = time("explode count") { ex.count() }
      println(s"   exploded rows=$nex")
      time("explode+hash60 count (no cache)") {
        ex.select(col(id), TextFunctions.hash60(col("_s")).as("h")).count() }
      val rows = MinHash.shingleRows(MinHash.withShingles(docs, id, "text"), id)
        .select(col(id), TextFunctions.hash60(col("shingle")).as("h"))
        .cache()
      time("rows build+cache (count)") { rows.count() }
      time("rows cached re-count") { rows.count() }
      val dfh = rows.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val vocab = time("vocab = dfh.count") { dfh.count() }
      val nDocs = time("nDocs distinct count") { rows.select(col(id)).distinct().count() }
      println(s"   vocab=$vocab nDocs=$nDocs")
      val words = ((vocab + 63) / 64).toInt
      val ranks = rows.select(col("h")).distinct()
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("h"))) - 1)
      val bits = rows.join(ranks, Seq("h"))
        .groupBy(col(id))
        .agg(collect_list(col("r")).as("_rs"), count(lit(1)).as("n"))
        .select(col(id), col("n"),
          call_function("graft_bitset", col("_rs"), lit(words)).as("bits"))
      time("bits build (count)") { bits.count() }
      val a = bits.select(col(id).as("id_a"), col("n").as("_na"), col("bits").as("_ba"))
      val b = bits.select(col(id).as("id_b"), col("bits").as("_bb"))
      val pairs = a.crossJoin(broadcast(b))
        .filter(col("id_a") =!= col("id_b"))
        .withColumn("containment",
          call_function("graft_bitand_count", col("_ba"), col("_bb")) * lit(1.0) / col("_na"))
        .filter(col("containment") >= 0.8)
      time("crossJoin+popcount (count)") { pairs.count() }
      time("full q67 fresh (count)") {
        Graft.releaseCaches(); spark.catalog.clearCache()
        SparkEntry.queries("q67_containment")(spark, d).count()
      }
      Graft.releaseCaches(); spark.catalog.clearCache()
    }
  }
}
