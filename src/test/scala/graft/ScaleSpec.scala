package graft

import org.apache.spark.sql.functions._

/** Pins the invariants of ScaleBench's derived corpus (the data behind the
  * round-10 scaling-exponent evidence): a k-fold scale-up must multiply row
  * counts, preserve each copy's duplication rate and token-distribution
  * shape (vocab permutation, not cloning), keep catalogs fixed, and never
  * collide keys across copies — otherwise the measured exponents describe a
  * different workload than claimed.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-scale").toString
    ScaleBench.generate(spark, sfDir, d, k = 3)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$outDir/$name.parquet")

  test("scale-up multiplies fact rows by k and keeps catalogs fixed") {
    for (n <- Seq("documents", "embeddings", "orders", "lineitem", "customer", "events"))
      assert(t(n).count() === Tables.t(spark, sfDir, n.stripSuffix(".parquet")).count() * 3,
        s"table $n")
    for (n <- Seq("region", "nation", "part", "supplier"))
      assert(t(n).count() === Tables.t(spark, sfDir, n).count(), s"catalog $n")
  }

  test("each document copy replicates the corpus's duplication rate, not clones") {
    val docs = t("documents")
    val base = Tables.documents(spark, sfDir)
    val perCopy = docs.groupBy(($"doc_id" / lit(100000000L)).cast("long").as("copy"))
      .agg(countDistinct($"text").as("distinct_texts"), count(lit(1)).as("rows"))
      .collect()
    assert(perCopy.length === 3)
    val baseDistinct = base.select(countDistinct($"text")).as[Long].head()
    perCopy.foreach { r =>
      assert(r.getAs[Long]("distinct_texts") === baseDistinct,
        s"copy ${r.getAs[Long]("copy")}: per-copy dup rate must equal the base corpus's")
    }
    // Permutation, not cloning: a non-original copy shares almost no text
    // with the base corpus (token identities moved).
    val clonedFromBase = docs.where($"doc_id" >= 100000000L)
      .join(base.select($"text"), Seq("text"), "left_semi").count()
    assert(clonedFromBase < base.count() / 2,
      "non-original copies should not be verbatim clones of the base corpus")
  }

  test("vocab permutation preserves token-count shape exactly") {
    val docs = t("documents")
    val base = Tables.documents(spark, sfDir)
    // n_chars stays consistent with the rewritten text (word widths change
    // under permutation — n_chars is recomputed, not carried), and each
    // copy's tokens-per-doc histogram equals the base corpus's exactly
    // (permutation maps tokens 1:1, so token counts are invariant).
    assert(docs.where($"n_chars" =!= length($"text")).count() === 0L)
    val baseHist = base.groupBy(size(split($"text", " ")).as("ntok")).count()
      .orderBy($"ntok").as[(Int, Long)].collect().toSeq
    (0L until 3L).foreach { c =>
      val h = docs.where(($"doc_id" / lit(100000000L)).cast("long") === c)
        .groupBy(size(split($"text", " ")).as("ntok")).count()
        .orderBy($"ntok").as[(Int, Long)].collect().toSeq
      assert(h === baseHist, s"copy $c token-count histogram")
    }
  }

  test("strided keys never collide across copies and joins stay closed") {
    val orders = t("orders")
    assert(orders.select($"o_orderkey").distinct().count() === orders.count())
    // referential closure: every lineitem order key resolves to an order
    val dangling = t("lineitem").join(orders, $"l_orderkey" === $"o_orderkey", "left_anti").count()
    assert(dangling === 0L)
    // and every order's customer exists in the scaled customer table
    val noCust = orders.join(t("customer"), $"o_custkey" === $"c_custkey", "left_anti").count()
    assert(noCust === 0L)
  }

  test("chained derivation: restricted tables, wider stride, decorrelated seeds") {
    // The third-decade corpus derives from an already-derived one: only
    // the selected tables are written, the wider stride clears the first
    // derivation's id range, and the distinct seed base keeps composed
    // vocab permutations from cloning first-derivation copies verbatim.
    val d2 = java.nio.file.Files.createTempDirectory("graft-scale2").toString
    ScaleBench.generate(spark, outDir, d2, k = 2,
      stride = 10000000000L, seedBase = 2042L, tables = Set("documents"))
    val written = new java.io.File(d2).listFiles().map(_.getName).toSet
    assert(written == Set("documents.parquet"), s"restricted write leaked: $written")
    val docs = spark.read.parquet(s"$d2/documents.parquet")
    val srcCount = t("documents").count()
    assert(docs.count() === srcCount * 2)
    assert(docs.select($"doc_id").distinct().count() === srcCount * 2,
      "wider stride must keep chained ids collision-free")
    // copy 1 (seed 2042 permutation of the WHOLE first-decade corpus)
    // shares almost no verbatim text with copy 0 = the first-decade corpus
    // itself — composed permutations stay distinct from first-round ones.
    val cloned = docs.where($"doc_id" >= 10000000000L)
      .join(docs.where($"doc_id" < 10000000000L).select($"text"),
        Seq("text"), "left_semi").count()
    assert(cloned < srcCount / 2,
      s"chained copies should not clone first-derivation text ($cloned of $srcCount)")
  }

  test("embedding copies are jittered, not duplicated, and keep dimension") {
    val emb = t("embeddings")
    val base = Tables.embeddings(spark, sfDir)
    assert(emb.where(size($"embedding") =!= 64).count() === 0L)
    // a copied vector differs from its source vector but only slightly
    val byMod = emb.withColumn("src_id", pmod($"vec_id", lit(100000000L)))
      .withColumn("copy", ($"vec_id" / lit(100000000L)).cast("long"))
      .join(base.select($"vec_id".as("src_id"), $"embedding".as("base_emb")), "src_id")
    val drift = byMod.where($"copy" > 0)
      .select(aggregate(zip_with($"embedding", $"base_emb", (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => acc + x).as("l1"))
      .agg(min($"l1").as("minL1"), max($"l1").as("maxL1"))
      .as[(Double, Double)].head()
    assert(drift._1 > 0.0, "copies must not be exact duplicates")
    assert(drift._2 < 64 * 0.006, "jitter must stay within the documented bound")
  }
}
