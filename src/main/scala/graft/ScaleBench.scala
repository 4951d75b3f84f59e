package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proofing harness (round 10): measures the hot query families at
  * sf0.1 AND at a derived 10x corpus ("sf1"), and records per-query scaling
  * ratios/exponents — converting the catalog's argued "survives 100x" plan
  * claims into observed evidence (VERDICT r9 ask #1).
  *
  * == The derived sf1 corpus ==
  * The driver generates sf0.001/0.01/0.1 only, so sf1 is derived here from
  * sf0.1 deterministically, preserving the distributions that govern each
  * hot family's cost model rather than the exact generator:
  *
  *  - `documents` (5k -> 50k): 10 copies; copy 0 is the original, copy i
  *    applies a per-copy seeded PERMUTATION of the (tiny, closed) token
  *    vocabulary to every token. A vocab permutation preserves document
  *    length, within/cross-document repetition structure, per-source and
  *    per-language mixes, and the exact-duplicate rate PER COPY — each copy
  *    is a "translated" replica of the corpus, so shingle/minhash/line/chunk
  *    dedup see 10x the data with the sf0.1 duplication rate, not 10 exact
  *    clones of every doc (verbatim replication would instead measure an
  *    artificial 10-way near-dup clique, a different workload). Cross-copy
  *    gram collisions exist (the vocab is closed) exactly as new data at
  *    scale collides with old.
  *  - `embeddings` (2k -> 20k): vec_id strided; each copied vector gets a
  *    small deterministic per-(id, dim) jitter so ANN has 10x distinct
  *    points with the same cluster geometry.
  *  - `orders`/`lineitem`/`customer`/`events` (10x): key-strided copies —
  *    o_orderkey/l_orderkey/o_custkey/c_custkey/event_id/user_id move by
  *    `copy * stride`; part/supplier/nation/region stay FIXED (catalogs
  *    grow much slower than facts at real scale, and q76's pair space is
  *    the part catalog, not the order count).
  *
  * Generated once under target/scaledata/sf1 (gitignored), reused across
  * runs; SPARK_GRAFT_SCALE_FORCE=1 regenerates.
  *
  * == Measurement ==
  * Same discipline as Bench: steady-state (full warmup pass at sf0.001),
  * min-of-2 passes with cache clears at pass boundaries, single-thread and
  * all-core spin probes before each measurement so host contention is
  * legible in the record. Output: one JSON line + scale.json in CWD with
  * per-query {sf0_1_sec, scaled_sec, ratio, exponent}; exponent =
  * log(ratio)/log(k) (1.0 = linear, <=~1.2 allows shuffle growth).
  */
object ScaleBench {

  /** Queries whose cost model the 100 TB claims lean on, plus three
    * relational anchors (q01/q06/q17) as linear-scaling controls.
    */
  val hotSet: Seq[String] = Seq(
    "q01_pricing_summary", "q06_star_agg", "q17_sessionize",
    "q19_dedup_exact", "q20_ngram_jaccard", "q21_minhash_lsh",
    "q22_simhash", "q35_dedup_cosine", "q39_dup_clusters",
    "q43_ann_ivf", "q56_tfidf", "q59_crosscorpus_dedup",
    "q66_winnow", "q67_containment", "q68_containment_prune",
    "q72_chunk_dedup", "q74_bigram_logprob", "q76_copurchase",
    "q82_line_dedup", "q83_source_overlap", "q85_boilerplate_grams",
    "q86_semdedup")

  /** Key stride between copies: far above any sf0.1 key range, so strided
    * ids never collide across copies.
    */
  private val Stride = 100000000L

  /** Deterministic vocab permutation for one copy (seeded shuffle). */
  private def vocabPermutation(vocab: Seq[String], copy: Int): Map[String, String] = {
    val rnd = new scala.util.Random(1042L + copy)
    vocab.zip(rnd.shuffle(vocab)).toMap
  }

  def generate(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    import spark.implicits._
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // Catalog tables: fixed across copies (catalogs grow slower than facts).
    Seq("region", "nation", "part", "supplier").foreach { t =>
      write(Tables.t(spark, srcDir, t), t)
    }

    val copies = spark.range(0, k).select($"id".cast("int").as("copy"))

    def strided(df: DataFrame, keys: Seq[String]): DataFrame = {
      val crossed = df.crossJoin(broadcast(copies))
      keys.foldLeft(crossed)((d, c) => d.withColumn(c, col(c) + $"copy" * Stride))
        .drop("copy")
    }
    write(strided(Tables.customer(spark, srcDir), Seq("c_custkey")), "customer")
    write(strided(Tables.orders(spark, srcDir), Seq("o_orderkey", "o_custkey")), "orders")
    write(strided(Tables.lineitem(spark, srcDir), Seq("l_orderkey")), "lineitem")
    write(strided(Tables.events(spark, srcDir), Seq("event_id", "user_id")), "events")

    // Documents: per-copy vocab permutation (see object doc). The vocab is
    // closed and tiny by construction of the synthetic corpus; guard anyway.
    val docs = Tables.documents(spark, srcDir)
    val vocab = docs.select(explode(split($"text", " ")).as("tok"))
      .where(length($"tok") > 0).distinct().as[String].collect().toSeq.sorted
    require(vocab.size <= 10000,
      s"scale-up vocab permutation expects a closed synthetic vocabulary; got ${vocab.size} tokens")
    val permuted = (0 until k).map { copy =>
      val withId = docs.withColumn("doc_id", $"doc_id" + lit(copy.toLong * Stride))
      if (copy == 0) withId
      else {
        val m = vocabPermutation(vocab, copy)
        val mapCol = map(m.toSeq.flatMap { case (a, b) => Seq(lit(a), lit(b)) }: _*)
        withId
          .withColumn("text",
            array_join(transform(split($"text", " "),
              t => coalesce(element_at(mapCol, t), t)), " "))
          .withColumn("n_chars", length($"text"))
      }
    }.reduce(_ unionByName _)
    write(permuted, "documents")

    // Embeddings: strided ids + per-(id, dim) jitter in [-0.005, 0.005).
    val emb = Tables.embeddings(spark, srcDir)
    val scaledEmb = emb.crossJoin(broadcast(copies))
      .withColumn("vec_id", $"vec_id" + $"copy" * Stride)
      .withColumn("embedding", when($"copy" === 0, $"embedding").otherwise(
        transform($"embedding",
          (v, j) => (v + (pmod(hash($"vec_id", j), lit(1000)) - 500) / lit(100000.0))
            .cast("float"))))
      .drop("copy")
    write(scaledEmb, "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scaledata/sf1")
    val k = sys.env.get("SPARK_GRAFT_SCALE_K").map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = Graft.session(s"local[$cpus]", Some(cpus.toInt))
    spark.sparkContext.setLogLevel("WARN")

    val marker = new java.io.File(s"$outDir/_GRAFT_SCALE_OK")
    if (!marker.isFile || sys.env.contains("SPARK_GRAFT_SCALE_FORCE")) {
      System.err.println(s"[scale] generating ${k}x corpus at $outDir from $srcDir")
      val t0 = System.nanoTime()
      generate(spark, srcDir, outDir, k)
      java.nio.file.Files.write(marker.toPath, s"k=$k src=$srcDir\n".getBytes)
      System.err.println(f"[scale] generated in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    // An explicit SPARK_GRAFT_QUERIES list may name ANY registered query
    // (the derived corpora carry every table), not just the hot set.
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val catalog = only
      .fold(hotSet)(sel => SparkEntry.queries.keys.toSeq.sorted.filter(sel.contains))
      .map(n => n -> SparkEntry.queries(n))

    // Steady-state warmup (compile-cache fill) at the smallest SF.
    val warmDir = {
      val sib = new java.io.File(new java.io.File(srcDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else srcDir
    }
    catalog.foreach { case (n, fn) =>
      try fn(spark, warmDir).count() catch {
        case t: Throwable => System.err.println(s"[scale] warm $n failed: ${String.valueOf(t).take(160)}")
      }
    }

    def spin(): Long = { var s = 0L; var i = 0; while (i < (1 << 22)) { s += i * 2654435761L; i += 1 }; s }
    def probe(): Double = try {
      val t0 = System.nanoTime(); if (spin() == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e6
    } catch { case _: Throwable => -1.0 }
    val nThreads = Runtime.getRuntime.availableProcessors()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads,
      (r: Runnable) => { val t = new Thread(r, "scale-probe"); t.setDaemon(true); t })
    def pprobe(): Double = try {
      import scala.jdk.CollectionConverters._
      val t0 = System.nanoTime()
      val tasks = Seq.fill(nThreads)(new java.util.concurrent.Callable[Long] {
        override def call(): Long = spin()
      }).asJava
      if (pool.invokeAll(tasks).asScala.map(_.get()).sum == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e6
    } catch { case _: Throwable => -1.0 }
    probe(); pprobe()

    // name -> (dir-tag -> (best sec, probes)); min over passes, caches
    // cleared at each pass boundary so family-cache builds are paid in both.
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(2)
    val best = scala.collection.mutable.Map[(String, String), (Double, Double, Double)]()
    val scaledTag = s"x$k" // k=10 -> "x10" (sf1), k=100 -> "x100" (sf10)
    val dirs = Seq("sf0.1" -> srcDir, scaledTag -> outDir)
    (1 to passes).foreach { pass =>
      dirs.foreach { case (tag, dir) =>
        spark.catalog.clearCache()
        catalog.foreach { case (name, fn) =>
          val p = probe(); val pp = pprobe()
          val t0 = System.nanoTime()
          try fn(spark, dir).count() catch {
            case t: Throwable =>
              System.err.println(s"[scale] $name@$tag FAILED: ${String.valueOf(t).take(200)}")
          }
          val sec = (System.nanoTime() - t0) / 1e9
          val cur = best.get((name, tag))
          if (cur.forall(_._1 > sec)) best((name, tag)) = (sec, p, pp)
          System.err.println(f"[scale] pass$pass $name@$tag $sec%.2fs (probe $p%.1f/$pp%.1f ms)")
        }
      }
    }
    pool.shutdown()

    def f2(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val rows = catalog.map(_._1).map { n =>
      val (a, pa, ppa) = best((n, "sf0.1"))
      val (b, pb, ppb) = best((n, scaledTag))
      val ratio = b / a
      val expo = math.log(ratio) / math.log(k.toDouble)
      (n, a, b, ratio, expo, Seq(pa, pb).max, Seq(ppa, ppb).max)
    }
    val qjson = rows.map { case (n, a, b, r, e, p, pp) =>
      s""""$n":{"sf0_1_sec":${f2(a)},"scaled_sec":${f2(b)},"ratio":${f2(r)},"exponent":${f2(e)},"probe_ms":${f2(p)},"pprobe_ms":${f2(pp)}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"scale","k":$k,"passes":$passes,"queries":$qjson}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get("scale.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case t: Throwable => System.err.println(s"[scale] scale.json write failed: $t") }
    spark.stop()
  }
}
