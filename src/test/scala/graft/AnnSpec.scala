package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Binary
import graft.sim.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches hand math") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
    val out = df.select(round(Ann.cosine(col("a"), col("b")), 9)).as[Double].collect()
    assert(out(0) == 0.0 && out(1) == 1.0)
  }

  test("bruteforceTopK ranks by cosine and excludes self") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val out = Ann.bruteforceTopK(vecs, vecs.filter(col("id") === 0), 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L)) // nearest first
    assert(!out.map(_.getLong(2)).contains(0L))
  }

  test("hyperplane buckets are deterministic and complete") {
    // ±1±2±4 is never zero, so every plane takes a definite sign
    val vecs = Seq((0L, Seq(1.0, 2.0, 4.0)), (1L, Seq(-1.0, -2.0, -4.0)))
      .toDF("id", "vec")
    val b1 = Ann.hyperplaneBuckets(vecs, 8).orderBy("id").collect().map(_.getLong(1))
    val b2 = Ann.hyperplaneBuckets(vecs, 8).orderBy("id").collect().map(_.getLong(1))
    assert(b1.toSeq == b2.toSeq)
    // opposite vectors get complementary sign patterns
    assert((b1(0) ^ b1(1)) == 255L)
  }

  test("native graft_dot matches the interpreted HOF fold bit-for-bit") {
    val df = Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id"), Ann.toDouble(col("embedding")).as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val mismatches = df
      .withColumn("native", call_function("graft_dot", col("v"), col("v")))
      .withColumn("interp", hof)
      .filter(col("native") =!= col("interp"))
    assert(mismatches.count() == 0)
  }

  test("IVF recall@3 grows with nprobe and is exact at full probe") {
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), Ann.toDouble(col("embedding")).as("vec"), col("label"))
    val queries = v.filter(col("id") < 20)
    val exact = Ann.bruteforceTopK(v, queries, 3)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    def recall(nprobe: Int): Double =
      exact.join(Ann.ivfTopK(v, queries, nprobe, 3)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count().toDouble / nExact
    val nCells = v.select("label").distinct().count().toInt
    val r2 = recall(2); val r5 = recall(5); val rAll = recall(nCells)
    // probing every cell = brute force; fewer probes trade recall for
    // the ~nprobe/|cells| corpus fraction actually scanned
    assert(rAll == 1.0, s"full-probe recall = $rAll")
    assert(r5 >= r2, s"recall must not fall as nprobe grows: $r2 -> $r5")
    assert(r2 > 0.1, s"nprobe=2 recall degenerate: $r2")
  }

  test("native graft_hash60 matches the composed conv(md5) chain exactly") {
    val df = Tables.documents(spark, sfDir)
      .select(col("text"), col("doc_id").cast("string").as("id_s"))
    val bad = df.filter(
      graft.ops.Cdm.hash60(col("text")) =!= graft.ops.Cdm.hash60Composed(col("text")) ||
      graft.ops.Cdm.hash60(col("id_s")) =!= graft.ops.Cdm.hash60Composed(col("id_s")))
    assert(bad.count() == 0)
    // empty string + non-trivial literal pin the exact value
    import spark.implicits._
    val vals = Seq("", "0|alpha beta").toDF("s")
      .select(graft.ops.Cdm.hash60(col("s")), graft.ops.Cdm.hash60Composed(col("s")))
      .as[(Long, Long)].collect()
    assert(vals.forall(v => v._1 == v._2))
  }

  test("typed mapPartitions decode agrees with the column-level fake decode") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val typed = Binary.metadata(spark, docs).toDF()
    val sql = docs.select(col("doc_id"),
      length(col("text").cast("binary")).as("byte_len"),
      (lit(320) + graft.ops.Cdm.hash60(col("text")) % 1600).cast("int").as("width"))
    val joined = typed.join(sql, "doc_id")
      .filter(typed("byte_len") =!= sql("byte_len") || typed("width") =!= sql("width"))
    assert(joined.count() == 0)
  }
}
