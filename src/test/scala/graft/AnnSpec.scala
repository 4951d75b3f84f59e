package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Binary
import graft.sim.{Ann, Hnsw}

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

  test("semDedup: covered-by-earlier verdicts, cross-bucket blindness, kept rows NULL") {
    // Hand-built buckets (bypass LSH): bucket 7 holds three near-parallel
    // vectors (1,2,3) and one orthogonal (4); vector 5 duplicates 1 but
    // sits in another bucket, so it cannot be covered.
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.999, 0.01)), (3L, Seq(0.99, 0.02)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(1.0, 0.0)))
      .toDF("id", "vec")
    val buckets = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L), (5L, 9L))
      .toDF("id", "bucket")
    val out = Ann.semDedup(vecs, buckets, 0.95).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getLong(3))).toMap
    assert(out(1L) == (None, 0L), "first occurrence is kept")
    assert(out(2L) == (Some(1L), 1L), "covered by the earlier near-parallel")
    assert(out(3L) == (Some(1L), 2L), "both 1 and 2 cover 3; smallest id wins")
    assert(out(4L) == (None, 0L), "orthogonal vector is kept")
    assert(out(5L) == (None, 0L), "duplicate in another bucket is invisible to LSH")
    assert(out.size == 5, "one verdict row per input vector")
  }

  test("planesFor holds expected bucket size across corpus growth") {
    // one extra plane per doubling; expected n/2^planes never exceeds target
    assert(Ann.planesFor(256, 256) === 1)
    assert(Ann.planesFor(2000, 256) === 3)
    assert(Ann.planesFor(200000, 256) === 10)
    for (n <- Seq(1L, 1000L, 50000L, 5000000L, 500000000L)) {
      val p = Ann.planesFor(n)
      assert(n.toDouble / math.pow(2, p) <= 256.0, s"n=$n planes=$p")
    }
    assert(Ann.planesFor(1L << 40, 256) === 32) // log-growth, never huge
    // clamped at the Long bucket-bitmask bound
    assert(Ann.planesFor(Long.MaxValue, 1) === 62)
  }

  test("semDedupAuto / bucketTop1Auto equal the fixed-planes ops at the derived count") {
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), Ann.toDouble(col("embedding")).as("vec"))
    val derived = Ann.planesFor(v.count(), targetBucket = 64)
    val auto = Ann.semDedupAuto(v, 0.35, targetBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = Ann.semDedup(v.select(col("id"), col("vec")),
        Ann.hyperplaneBuckets(v, derived), 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == fixed && auto.nonEmpty)
    val autoTop = Ann.bucketTop1Auto(v, targetBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixedTop = Ann.bucketTop1(v, Ann.hyperplaneBuckets(v, derived))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoTop == fixedTop && autoTop.nonEmpty)
  }

  test("Pca.symmetricEigen: known 2x2 eigenpairs, orthonormal, sign-fixed") {
    val (vals, vecs) = graft.sim.Pca.symmetricEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      vecs(0).toSeq)
    assert(vecs(1).zip(Array(r, -r)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      vecs(1).toSeq)
  }

  test("Pca.fit recovers planted axes: eigen residuals, orthonormality, " +
      "variance capture; transform == driver projection") {
    // deterministic planted-subspace corpus in d=6: big variance along
    // u1, smaller along u2, trace noise elsewhere (no RNG — index math)
    val d = 6
    val u1 = Array(1.0, 1.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val u2 = Array(0.0, 0.0, 1.0, -1.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val rows = (0 until 200).map { i =>
      val a = math.sin(i * 0.37) * 10.0
      val b = math.cos(i * 0.53) * 3.0
      val noise = Array.tabulate(d)(j => math.sin(i * 1.1 + j * 2.3) * 0.05)
      (i.toLong, Array.tabulate(d)(j =>
        (a * u1(j) + b * u2(j) + noise(j)).toFloat))
    }
    val df = rows.toDF("id", "vec")
    val model = graft.sim.Pca.fit(df, "vec", 3)
    // variance ordering + capture: two planted axes dominate
    assert(model.eigenvalues(0) > model.eigenvalues(1) &&
      model.eigenvalues(1) > model.eigenvalues(2))
    assert(model.eigenvalues(0) > 20 && model.eigenvalues(1) > 2 &&
      model.eigenvalues(2) < 0.1, model.eigenvalues.toSeq)
    // components orthonormal
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = model.components(i).zip(model.components(j)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j) $dot")
    }
    // top components span the planted axes (|cos| ≈ 1 up to noise)
    def absCos(a: Array[Double], b: Array[Double]) =
      math.abs(a.zip(b).map(t => t._1 * t._2).sum)
    assert(absCos(model.components(0), u1) > 0.999, model.components(0).toSeq)
    assert(absCos(model.components(1), u2) > 0.999, model.components(1).toSeq)
    // eigen residual against the actual covariance: ||C·v − λ·v|| small
    val n = rows.size.toDouble
    val mean = Array.tabulate(d)(j => rows.map(_._2(j).toDouble).sum / n)
    val cov = Array.tabulate(d, d)((p, q) =>
      rows.map(r => (r._2(p) - mean(p)) * (r._2(q) - mean(q))).sum / n)
    for (i <- 0 until 3) {
      val v = model.components(i)
      val cv = Array.tabulate(d)(p => (0 until d).map(q => cov(p)(q) * v(q)).sum)
      val res = math.sqrt(Array.tabulate(d)(p =>
        math.pow(cv(p) - model.eigenvalues(i) * v(p), 2)).sum)
      assert(res < 1e-6, s"eigen residual $i: $res")
    }
    // transform parity with the driver-side projection
    val got = graft.sim.Pca.transform(df, "vec", model, "p")
      .select(col("id"), col("p")).as[(Long, Seq[Double])].collect()
      .sortBy(_._1).take(5)
    got.foreach { case (id, p) =>
      val vec = rows(id.toInt)._2.map(_.toDouble)
      val want = model.components.map(c =>
        c.indices.map(j => (vec(j) - model.mean(j)) * c(j)).sum)
      p.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"id=$id $p vs ${want.toSeq}")
      }
    }
    // whiten = true → unit variance per component on the fit corpus
    val wh = graft.sim.Pca.transform(df, "vec", model, "p", whiten = true)
      .select(col("p")).as[Seq[Double]].collect()
    for (i <- 0 until 3) {
      val xs = wh.map(_(i))
      val mu = xs.sum / xs.size
      val va = xs.map(x => (x - mu) * (x - mu)).sum / xs.size
      assert(math.abs(va - 1.0) < 1e-6, s"whitened comp $i variance $va")
    }
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

  test("IVF recall gate at sf0.01: monotone in nprobe, above the measured floor") {
    // The synthetic embeddings are near-uniform in 64-d (measured: mean
    // same-label cosine 0.0016 vs 0.0003 cross-label; top-3 same-label
    // fraction 0.105 ≈ the 0.1 random baseline), so ANY partition-based
    // ANN's recall ≈ the corpus fraction scanned — an intrinsic data
    // ceiling, not an implementation property. This gate pins the measured
    // achievable levels so a candidate-generation bug (dropped cells, bad
    // centroid math) still fails loudly; the clustered-data test below
    // gates the ≥0.9 regime where structure exists to exploit.
    val d01 = "/root/testdata/sf0.01"
    val v = Tables.embeddings(spark, d01)
      .select(col("vec_id").as("id"), Ann.toDouble(col("embedding")).as("vec"), col("label"))
    val queries = v.filter(col("id") < 50)
    val exact = Ann.bruteforceTopK(v, queries, 3)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    def recall(nprobe: Int): Double =
      exact.join(Ann.ivfTopK(v, queries, nprobe, 3)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count().toDouble / nExact
    val r2 = recall(2); val r5 = recall(5)
    assert(r5 >= r2, s"recall fell as nprobe grew: $r2 -> $r5")
    assert(r2 >= 0.20, s"nprobe=2 recall below the 2/10-cells scan fraction: $r2")
    assert(r5 >= 0.55, s"nprobe=5 recall regressed below measured 0.607: $r5")
    exact.unpersist()
  }

  /** Deterministic 10-cluster corpus: cluster c lives on dims 6c..6c+5
    * with small per-point deterministic jitter — true neighbors are
    * in-cluster, the regime partition-based ANN exists for.
    */
  private def clusteredCorpus() = {
    val pts = for (c <- 0 until 10; i <- 0 until 40) yield {
      val vec = Array.tabulate(64) { dim =>
        val base = if (dim >= 6 * c && dim < 6 * c + 6) 1.0 else 0.0
        base + 0.05 * math.sin(1.0 + i * 64 + dim) // deterministic jitter
      }
      (c * 40L + i, vec.toSeq, c.toLong)
    }
    pts.toDF("id", "vec", "label")
  }

  test("IVF recall@3 >= 0.9 at nprobe=2 on clustered data") {
    // Probing the 2 nearest cells must recover >= 90% of exact top-3.
    val v = clusteredCorpus()
    val queries = v.filter(col("id") % 40 < 2) // 2 per cluster
    val exact = Ann.bruteforceTopK(v, queries, 3)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    val got = exact.join(Ann.ivfTopK(v, queries, 2, 3)
        .select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    val recall = got.toDouble / nExact
    assert(recall >= 0.9, s"clustered-data IVF recall@3 = $recall")
  }

  test("kmeansCells learns the quantizer — trained IVF recall@3 >= 0.9, no labels") {
    val truth = clusteredCorpus()
    // train from (id, vec) ONLY — the label column never enters
    val labeled = Ann.kmeansCells(truth.select(col("id"), col("vec")), 10, 3)
    // trained cells must align with the true clusters (each cell >= 90% one cluster)
    val cellStats = labeled.join(truth.select(col("id"), col("label").as("truth")), "id")
      .groupBy("label", "truth").count()
      .groupBy("label").agg(max("count").as("top"), sum("count").as("total"))
    val impure = cellStats.filter(col("top") < col("total") * 0.9).count()
    assert(impure == 0, s"$impure trained cells are mixed across true clusters")
    // and the trained index must hit the same recall bar as the labeled one
    val queries = labeled.filter(col("id") % 40 < 2)
    val exact = Ann.bruteforceTopK(labeled, queries, 3)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    val got = exact.join(Ann.ivfTopK(labeled, queries, 2, 3)
        .select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    val recall = got.toDouble / nExact
    assert(recall >= 0.9, s"trained-IVF recall@3 = $recall")
  }

  test("PQ codes are dense, in range, and deterministic across runs") {
    val v = clusteredCorpus().select(col("id"), col("vec"))
    val cb = Ann.pqTrain(v, m = 8, ksub = 16)
    // Codebook shape: 8 blocks × 16 codes (enough sample points exist).
    assert(cb.count() == 128)
    val codes = Ann.pqEncode(v, cb, m = 8, subDim = 8)
    // One code per (vector, block), every code in [0, 16).
    assert(codes.count() == 400 * 8)
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() == 0)
    // Deterministic end to end: an independent retrain+re-encode agrees.
    val again = Ann.pqEncode(v, Ann.pqTrain(v, m = 8, ksub = 16), m = 8, subDim = 8)
    assert(codes.exceptAll(again).isEmpty && again.exceptAll(codes).isEmpty,
      "PQ train/encode must be deterministic")
  }

  test("IVF-PQ: ADC alone is partial at fine granularity; shortlist rerank restores recall") {
    // Within a cluster all 39 neighbors are near-tied, so pure-ADC top-3
    // pays the quantization error (measured ~0.55 here) — the documented
    // reason the refine stage exists. The ADC top-30 shortlist + exact
    // rerank must recover >= 0.9 while touching full vectors only for the
    // shortlist.
    val v = clusteredCorpus()
    val queries = v.filter(col("id") % 40 < 2)
    val exact = Ann.bruteforceTopK(v, queries, 3)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    def recall(rerank: Int): Double = exact.join(
      Ann.ivfPqTopK(v, queries, m = 8, ksub = 16, nprobe = 2, k = 3, rerank = rerank)
        .select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count().toDouble / nExact
    val adcOnly = recall(0)
    assert(adcOnly >= 0.45, s"pure-ADC recall collapsed: $adcOnly")
    val reranked = recall(30)
    assert(reranked >= 0.9, s"reranked IVF-PQ recall@3 = $reranked")
    assert(reranked >= adcOnly, "rerank must never lose recall")
  }

  test("HNSW recall@3 >= IVF-PQ at EQUAL candidate budget; full-ef search " +
      "is exact; recall monotone in efSearch (q124 gates)") {
    val labeled = clusteredCorpus()
    val v = labeled.select(col("id"), col("vec"))
    val queries = v.filter(col("id") % 40 < 2)
    val exact = Ann.bruteforceTopK(v, queries, 3)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      exact.join(df.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count().toDouble / nExact
    // equal candidate budget: IVF-PQ reranks 30 exact distances per query;
    // HNSW with 2 shards × efSearch 15 evaluates the same 30
    val ivfpq = recallOf(Ann.ivfPqTopK(labeled, queries,
      m = 8, ksub = 16, nprobe = 2, k = 3, rerank = 30))
    val hnsw = recallOf(Hnsw.hnswTopK(v, queries, k = 3,
      m = 12, efConstruction = 32, efSearch = 15, shards = 2))
    assert(hnsw >= ivfpq,
      s"HNSW recall@3 $hnsw below IVF-PQ $ivfpq at equal candidate budget (30)")
    assert(hnsw >= 0.9, s"HNSW recall@3 = $hnsw")
    // one shard, ef = corpus: the beam covers everything reachable — exact
    val full = recallOf(Hnsw.hnswTopK(v, queries, k = 3,
      m = 12, efConstruction = 32, efSearch = 400, shards = 1))
    assert(full == 1.0, s"full-ef HNSW recall = $full")
    // recall never falls as the beam widens
    val narrow = recallOf(Hnsw.hnswTopK(v, queries, k = 3,
      m = 12, efConstruction = 32, efSearch = 4, shards = 2))
    assert(narrow <= hnsw + 1e-9, s"recall fell as efSearch grew: $narrow -> $hnsw")
  }

  test("HNSW Algorithm-4 neighbor heuristic: on a strongly clustered corpus " +
      "recall >= simple selection, and both stay deterministic (r19)") {
    // 10 tight, mutually-orthogonal clusters: simple M-closest selection
    // packs every link inside a node's own cluster, so the layer-0 graph's
    // inter-cluster bridges hinge on the few high-level nodes — a narrow
    // beam strands in the entry cluster. Algorithm 4 keeps a candidate
    // only while it is closer to the base than to every kept neighbor,
    // which preserves cross-cluster edges at equal degree.
    val pts = for (c <- 0 until 10; i <- 0 until 40) yield {
      val vec = Array.tabulate(64) { dim =>
        val base = if (dim >= 6 * c && dim < 6 * c + 6) 1.0 else 0.0
        base + 0.02 * math.sin(1.0 + i * 64 + dim)
      }
      (c * 40L + i, vec)
    }
    val queries = pts.filter(_._1 % 40 < 2)
    def exactTop3(q: Array[Double]): Set[Long] = {
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var sab = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
        while (i < a.length) { sab += a(i) * b(i); sa += a(i) * a(i); sb += b(i) * b(i); i += 1 }
        sab / math.sqrt(sa * sb)
      }
      pts.map { case (id, v) => (cos(q, v), id) }
        .sortBy { case (c2, id) => (-c2, id) }.take(3).map(_._2).toSet
    }
    def recall(heuristic: Boolean): Double = {
      val idx = new Hnsw.Index(m = 6, efConstruction = 32, heuristic = heuristic)
      pts.foreach { case (id, v) => idx.insert(id, v) }
      val hits = queries.map { case (qid, qv) =>
        val got = idx.search(qv, 4, 16).filter(_._1 != qid).take(3).map(_._1).toSet
        (got intersect (exactTop3(qv) - qid)).size
      }
      hits.sum.toDouble / queries.map(q => (exactTop3(q._2) - q._1).size).sum
    }
    val simple = recall(heuristic = false)
    val heur = recall(heuristic = true)
    assert(heur >= simple,
      s"Algorithm-4 recall $heur fell below simple selection $simple on clustered data")
    assert(heur >= 0.85, s"Algorithm-4 clustered recall@3 = $heur (simple = $simple)")
    // determinism holds for the heuristic path too
    assert(recall(heuristic = true) == heur)
  }

  test("HNSW is deterministic: same corpus + shard count => identical output; " +
      "self-pairs excluded; cos matches the exact dot") {
    val v = clusteredCorpus().select(col("id"), col("vec"))
    val queries = v.filter(col("id") % 40 === 0).limit(5)
    def run() = Hnsw.hnswTopK(v, queries, k = 5,
      m = 8, efConstruction = 32, efSearch = 20, shards = 3)
    val a = run().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val b = run().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a == b, "two identical builds must agree exactly")
    val out = run()
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // reported cos = the exact cosine of the pair (no approximation in the
    // SCORE, only in which candidates were visited)
    val joined = out.join(v.select(col("id").as("query_id"), col("vec").as("qv")), "query_id")
      .join(v.select(col("id").as("neighbor_id"), col("vec").as("nv")), "neighbor_id")
      .withColumn("expect", Ann.cosine(col("qv"), col("nv")))
    assert(joined.filter(abs(col("cos") - col("expect")) > 1e-9).count() == 0)
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

  test("typed mapPartitions decode parses REAL PPM payloads (metadata matches the canvas arithmetic)") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val typed = Binary.metadata(spark, docs).toDF()
    // closed-form expectation from the 32-wide canvas construction
    val sql = docs.select(col("doc_id"),
      greatest(lit(1L), ceil(length(col("text").cast("binary")) / lit(96.0)).cast("long"))
        .as("_ph"))
      .select(col("doc_id"),
        (lit(11) + length(col("_ph").cast("string")) + lit(96) * col("_ph"))
          .cast("int").as("byte_len"),
        lit(32).as("width"), col("_ph").cast("int").as("height"),
        lit("ppm").as("format"))
    val joined = typed.alias("t").join(sql.alias("e"), "doc_id")
      .filter(col("t.byte_len") =!= col("e.byte_len") ||
        col("t.width") =!= col("e.width") || col("t.height") =!= col("e.height") ||
        col("t.format") =!= col("e.format"))
    assert(joined.count() == 0)
  }
}
