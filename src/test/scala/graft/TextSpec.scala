package graft

import org.apache.spark.sql.functions._
import graft.text.{MinHash, SimHash, TextFunctions => TF}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empties and non-alphanumerics") {
    val out = Seq("The  quick, brown FOX!").toDF("text")
      .select(TF.tokens(col("text"))).as[Seq[String]].head()
    assert(out == Seq("the", "quick", "brown", "fox"))
  }

  test("wordBigrams is empty for <2 tokens (no descending-sequence trap)") {
    val out = Seq("solo", "two words").toDF("text")
      .select(TF.wordBigrams(TF.tokens(col("text")))).as[Seq[String]].collect()
    assert(out(0).isEmpty && out(1) == Seq("two words"))
  }

  test("langPredict picks the dominant stopword language, 'und' when none") {
    val out = Seq("the cat and the dog of it", "der hund und die katze ist", "zzz qqq")
      .toDF("text").select(TF.langPredict(TF.tokens(col("text")))).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("MinHash finds a planted near-duplicate and scores exact duplicates at 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "one two three four five six seven eight"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta")) // exact dup of 1
      .toDF("doc_id", "text")
    val sh = MinHash.withShingles(docs, "doc_id", "text")
    val sig = MinHash.signature(MinHash.shingleRows(sh, "doc_id"), "doc_id", 8)
    val cand = MinHash.candidates(MinHash.bands(sig, "doc_id", 8, 2), "doc_id")
    val j = MinHash.jaccard(sh, cand, "doc_id")
      .collect().map(r => ((r.getLong(r.fieldIndex("id_a")), r.getLong(r.fieldIndex("id_b"))),
        r.getDouble(r.fieldIndex("jaccard")))).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 2L)) > 0.7 && j((1L, 2L)) < 1.0)
    assert(!j.contains((1L, 3L)))
  }

  test("MinHash: maxBucket drops degenerate stop-shingle buckets, keeps real dups") {
    // 40 docs that all share one hot shingle (every band collides for the
    // r=1 band built on it) + one genuine duplicate pair.
    val docs = (1L to 40L).map(i => (i, s"common anchor unique$i word$i filler$i")) :+
      (100L, "real duplicate pair of docs") :+ (101L, "real duplicate pair of docs")
    val df = docs.toDF("doc_id", "text")
    val sh = MinHash.withShingles(df, "doc_id", "text")
    val sig = MinHash.signature(MinHash.shingleRows(sh, "doc_id"), "doc_id", 8)
    val bands = MinHash.bands(sig, "doc_id", 8, 1) // r=1: hot shingle degenerates
    val uncapped = MinHash.candidates(bands, "doc_id", maxBucket = None).count()
    val capped = MinHash.candidates(bands, "doc_id", maxBucket = Some(10))
    // the 40-doc bucket (780 pairs per colliding band) is gone...
    assert(capped.count() < uncapped / 4,
      s"cap did not bound the hot bucket: ${capped.count()} vs $uncapped")
    // ...but the genuine duplicate pair still collides in its own buckets
    assert(capped.filter(col("id_a") === 100L && col("id_b") === 101L).count() == 1)
  }

  test("MinHash: the DEFAULT bucket cap bounds a saturated bucket (r10 scale fix)") {
    // BucketCap+20 exact clones form one band bucket above the default cap:
    // uncapped their pair count is quadratic (the sf10-observed blowup —
    // 197M candidates from a saturated shingle space); the default drops
    // the bucket while a small genuine-dup bucket survives untouched.
    val n = MinHash.BucketCap + 20
    val docs = (1L to n.toLong).map(i => (i, "saturated corpus hot boilerplate line here")) :+
      (9000L, "real duplicate pair of docs") :+ (9001L, "real duplicate pair of docs")
    val df = docs.toDF("doc_id", "text")
    val sig = MinHash.signature(
      MinHash.shingleRows(MinHash.withShingles(df, "doc_id", "text"), "doc_id"), "doc_id", 8)
    val bands = MinHash.bands(sig, "doc_id", 8, 2)
    val byDefault = MinHash.candidates(bands, "doc_id")
    assert(byDefault.filter(col("id_a") <= n && col("id_b") <= n).count() === 0L,
      "the over-cap clone bucket must contribute no candidate pairs by default")
    assert(byDefault.filter(col("id_a") === 9000L && col("id_b") === 9001L).count() === 1L)
    val exhaustive = MinHash.candidates(bands, "doc_id", maxBucket = None)
    assert(exhaustive.filter(col("id_a") <= n && col("id_b") <= n).count() ===
      n.toLong * (n - 1) / 2, "opt-out must restore exhaustive candidates")
  }

  test("MinHash: over-cap side channel reports dropped buckets and star-pairs the clique") {
    // The cap's recall cliff (r10 ADVICE): a >cap clique saturates all of
    // its own buckets → zero candidates → every member survives dedup.
    // The side channel pairs each member with the bucket's min-id
    // representative — LINEAR in clique size — so curation can still
    // collapse the clique.
    val n = MinHash.BucketCap + 20
    val docs = (1L to n.toLong).map(i => (i, "saturated corpus hot boilerplate line here")) :+
      (9000L, "real duplicate pair of docs") :+ (9001L, "real duplicate pair of docs")
    val df = docs.toDF("doc_id", "text")
    val sig = MinHash.signature(
      MinHash.shingleRows(MinHash.withShingles(df, "doc_id", "text"), "doc_id"), "doc_id", 8)
    val bands = MinHash.bands(sig, "doc_id", 8, 2)
    // diagnostics: one row per dropped bucket, each holding the clique
    val hot = MinHash.overCapBuckets(bands, MinHash.BucketCap).collect()
    assert(hot.nonEmpty && hot.forall(_.getLong(2) == n.toLong),
      s"every over-cap bucket is the clique: ${hot.mkString(",")}")
    // star pairs: every clique member pairs with the representative (id 1),
    // exactly once, and the under-cap genuine pair is NOT reported here
    val pairs = MinHash.overCapPairs(bands, "doc_id", MinHash.BucketCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (2L to n.toLong).map(i => (1L, i)).toSet,
      "one star pair per non-representative member")
    // side channel + capped candidates together cover the clique linearly:
    // n-1 star pairs instead of the n*(n-1)/2 exhaustive ones
    assert(pairs.size == n - 1)
  }

  test("Curate.keepSet(overCapStars): a >cap NEAR-dup clique collapses instead of all surviving") {
    // Members share a 30-token base (distinct trailing token → distinct
    // fingerprints, so exact dedup can't touch them; pairwise Jaccard
    // ~29/31 — genuine near-dups). The clique saturates its own band
    // buckets past BucketCap: capped candidates alone see NOTHING and all
    // members survive; the star side channel routes member×representative
    // pairs through the same exact verify and the clique collapses.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val n = MinHash.BucketCap + 60
    val cliqueIds = (1L to n.toLong).toSet
    val docs = ((1L to n.toLong).map(i => (i, s"$base extra$i")) :+
      (9000L, "totally unrelated content standing well apart"))
      .toDF("doc_id", "text")
    val without = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(cliqueIds.subsetOf(without),
      s"capped-only candidates should miss the saturated clique (survivors ${without.size})")
    val withStars = graft.text.Curate
      .keepSet(docs, "doc_id", "text", minQuality = 0, overCapStars = true)
      .select("doc_id").as[Long].collect().toSet
    val surviving = withStars.intersect(cliqueIds)
    assert(surviving.size < n / 4,
      s"star pairs should collapse the clique: ${surviving.size} of $n survive")
    assert(withStars.contains(9000L), "unrelated doc must survive either way")
  }

  test("SimHash: band-bucket cap drops a hot-fingerprint clique, keeps isolated pairs") {
    // 30 identical docs share one fingerprint → every band bucket holds the
    // whole clique; an unrelated near-pair sits in its own buckets.
    val docs = (1L to 30L).map(i => (i, "hot boilerplate text repeated verbatim")) :+
      (500L, "rare document about something else entirely") :+
      (501L, "rare document about something else entirely")
    val fp = SimHash.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text")
    val capped = SimHash.nearPairs(fp, "doc_id", 3, maxBucket = Some(10))
    assert(capped.filter(col("id_a") <= 30L).count() === 0L,
      "over-cap clique must contribute no pairs")
    assert(capped.filter(col("id_a") === 500L && col("id_b") === 501L).count() === 1L)
    // opt-out restores the clique's quadratic pairs
    val exhaustive = SimHash.nearPairs(fp, "doc_id", 3, maxBucket = None)
    assert(exhaustive.filter(col("id_a") <= 30L).count() === 30L * 29 / 2)
    // the default cap is a no-op at this scale
    assert(SimHash.nearPairs(fp, "doc_id", 3).count() === exhaustive.count())
    // the side channel star-pairs the dropped clique linearly: member ×
    // min-id representative, hamming-verified, nothing for small buckets
    val stars = SimHash.overCapPairs(fp, "doc_id", 3, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(stars == (2L to 30L).map(i => (1L, i, 0)).toSet,
      s"one zero-hamming star per clique member: ${stars.take(5)}")
  }

  test("Curate.keepSet(gopherRules): rule failures drop before the score gate") {
    val long = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"the the $long"),             // rules pass, survives
      (2L, "the the short doc here now")) // < 50 tokens → words_ok false
      .toDF("doc_id", "text")
    val without = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 0)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(without == Set(1L, 2L))
    val ruled = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 0,
        gopherRules = true)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ruled == Set(1L), ruled.toString)
  }

  test("Curate.keepSet(gopherRules): cluster keep-best runs over rule-PASSING members") {
    // Near-dup pair where the higher-quality member fails the rule gate:
    // doc 1 has no indicator stopwords (stopword_ok=false) but longer text
    // (higher quality score); doc 2 passes rules. Keep-best over ALL docs
    // would pick doc 1 as cluster best and then drop BOTH; the production
    // order keeps doc 2 as the best rule-passing member.
    val run = (1 to 58).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run extra1 extra2 extra3 extra4 extra5 extra6"), // 64 toks, 0 stopwords
      (2L, s"the the $run"))                                   // 60 toks, near-dup of 1
      .toDF("doc_id", "text")
    // fixture premise: the pair must actually collide into a cluster, or
    // the test degenerates to the independent-survival path
    val sh = MinHash.withShingles(docs, "doc_id", "text")
    val sig = MinHash.signature(MinHash.shingleRows(sh, "doc_id"), "doc_id", 16)
    val cand = MinHash.candidates(MinHash.bands(sig, "doc_id", 4, 2), "doc_id")
    assert(MinHash.jaccard(sh, cand, "doc_id")
      .filter(col("jaccard") >= 0.5).count() == 1,
      "fixture premise broken: docs are not near-dup candidates")
    val ruled = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 0,
        gopherRules = true)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ruled == Set(2L), s"cluster lost its rule-passing member: $ruled")
  }

  test("Curate.keepSet(gopherRules): exact keeper elected among rule-PASSING members") {
    // Fingerprints normalize WHITESPACE but rule verdicts read RAW text:
    // both docs normalize to the identical string ("- the the w1..w60" on
    // one line), yet doc 1's raw form is a single all-bullet line
    // (bullet_ok false: 1 of 1 lines) while doc 2 splits the dash onto its
    // own line (1 of 2 lines → passes). Electing the keeper over ALL
    // members picks rule-failing doc 1 and the group loses every member;
    // the production order keeps doc 2.
    val run = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"- the the $run"),
      (2L, s"-\nthe the $run"))
      .toDF("doc_id", "text")
    val v = graft.text.Gopher.verdicts(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep")).as[(Long, Boolean)].collect().toMap
    assert(v == Map(1L -> false, 2L -> true),
      s"fixture premise broken: verdicts must split on line shape: $v")
    val kept = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 0,
        gopherRules = true)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(2L), s"exact group lost its rule-passing member: $kept")
  }

  test("Curate.keepSet(classifierWeights): learned gate drops before election (r15)") {
    // Train the q100 classifier on a tiny labeled set, then curate a
    // corpus where a near-dup pair splits on the LEARNED gate: the member
    // with the higher heuristic quality score carries junk vocabulary
    // (classifier-negative), its near-dup carries good vocabulary. Cluster
    // keep-best over ALL members would elect the junk doc and drop both;
    // the production order (rules → classifier → score) keeps the passing
    // member.
    val goodV = Seq("excellent", "insightful", "rigorous", "useful")
    val junkV = Seq("spamword", "junkword", "clickbait", "scamword")
    val train = ((1L to 10L).map(i => (i, (goodV ++ goodV).mkString(" "), 1)) ++
      (11L to 20L).map(i => (i, (junkV ++ junkV).mkString(" "), 0)))
      .toDF("doc_id", "text", "label")
    val w = graft.text.QualityClassifier.train(train, "doc_id", "text", "label",
      dim = 4096, epochs = 25, lr = 2.0)
    Graft.releaseCaches()
    val run = (1 to 58).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"the the and and of of $run spamword junkword clickbait scamword"),
      (2L, s"$run excellent insightful"))
      .toDF("doc_id", "text")
    // fixture premises: (a) the pair really collides into a cluster,
    val sh = MinHash.withShingles(docs, "doc_id", "text")
    val sig = MinHash.signature(MinHash.shingleRows(sh, "doc_id"), "doc_id", 16)
    val cand = MinHash.candidates(MinHash.bands(sig, "doc_id", 4, 2), "doc_id")
    assert(MinHash.jaccard(sh, cand, "doc_id")
      .filter(col("jaccard") >= 0.5).count() == 1,
      "fixture premise broken: docs are not near-dup candidates")
    // (b) the junk doc wins the HEURISTIC score, and (c) the learned gate
    // splits them the other way
    val th = docs.select(col("doc_id"), TF.qualityGrid(col("text")).as("t"))
      .as[(Long, Long)].collect().toMap
    assert(th(1L) > th(2L), s"fixture premise broken: junk doc must out-score: $th")
    val verdict = graft.text.QualityClassifier.score(docs, "doc_id", "text", w)
      .select(col("doc_id"), col("pass")).as[(Long, Boolean)].collect().toMap
    assert(verdict == Map(1L -> false, 2L -> true),
      s"fixture premise broken: classifier must split the pair: $verdict")
    // without the gate, keep-best elects the junk doc
    val ungated = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 0)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ungated == Set(1L), ungated.toString)
    // with it, the cluster keeps its classifier-passing member
    val gated = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 0,
        classifierWeights = Some(w))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(gated == Set(2L), s"cluster lost its classifier-passing member: $gated")
  }

  test("Curate.keepSet: exact losers, cluster losers and low-quality docs drop") {
    val baseA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val baseB = "amber basalt copper dune ember flint gneiss harbor iron jasper " +
      "karst lagoon marble nickel onyx pumice quartz ridge slate topaz"
    val docs = Seq(
      (1L, baseA + " uniform victor"),           // keeper (cluster {1,2}: exact copy)
      (2L, baseA + " uniform  victor"),          // exact copy modulo whitespace → drops
      (3L, baseB + " whisky xray"),              // near-dup of 4, equal quality → min id kept
      (4L, baseB + " whisky xrya"),              // anagram tail: identical score, drops on id
      (5L, "??? !!! ;;; ::: @@@ ###"),           // punct junk → quality gate drops
      (6L, "completely unrelated prose about entirely different things and words")
    ).toDF("doc_id", "text")
    val kept = graft.text.Curate.keepSet(docs, "doc_id", "text", minQuality = 4000)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 6L), s"keep set wrong: $kept")
  }

  test("native gramHashes/winnowSelect equal the built-ins HOF spelling") {
    // The native expressions are the hot path; the HOF spellings are the
    // specification. Any divergence is a native-code bug, so pin equality
    // on real documents plus adversarial shapes (multibyte chars, ties,
    // short/empty strings).
    val docs = Tables.documents(spark, sfDir).select(col("text"))
      .unionByName(Seq("", "ab", "aaaaaaaaaaaa", "ünïcødé grams héré indeed",
        "x y z " * 4).toDF("text"))
    val nat = docs.select(
      TF.winnowSelect(TF.gramHashes(col("text"), 8), 4).as("fps"))
    val hof = docs.select(
      TF.winnowSelectHof(TF.gramHashesHof(col("text"), 8), 4).as("fps"))
    assert(nat.exceptAll(hof).isEmpty && hof.exceptAll(nat).isEmpty,
      "native winnow family diverges from the HOF specification")
  }

  test("winnow edges: short text collapses to one gram, short stream to one window") {
    // len < k → charNgrams yields the whole string → one hash → one
    // fingerprint; k <= len < k+w-1 → fewer than w grams → one window.
    val out = Seq((1L, "abc"), (2L, "abcdefghi"), (3L, ""))
      .toDF("doc_id", "text")
      .withColumn("_hs", TF.gramHashes(col("text"), 8))
      .select(col("doc_id"), TF.winnowSelect(col("_hs"), 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).size == 1, s"short text must yield one fingerprint: ${out(1L)}")
    assert(out(2L).size == 1, s"short stream must yield one window min: ${out(2L)}")
    assert(out(3L).size == 1, "empty text degenerates to the empty-string gram")
  }

  test("containment: a quoted document is detected inside its quoting wrapper") {
    // The asymmetric shape the operator exists for: doc 1 fully quoted
    // inside doc 2 (low Jaccard, containment 1.0); doc 3 unrelated.
    val quoted = "alpha beta gamma delta epsilon zeta"
    val wrapper = "intro words before the quote " + quoted +
      " and a long tail of commentary after the quotation ends here with extra context"
    val docs = Seq((1L, quoted), (2L, wrapper), (3L, "entirely different content altogether"))
      .toDF("doc_id", "text")
    def run(denseMax: Long, budget: Long = 256L << 20) = graft.text.Containment
      .containmentJoin(docs, "doc_id", "text", 0.8, denseVocabMax = denseMax,
        denseBroadcastMaxBytes = budget)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect().toSet
    for (denseMax <- Seq(0L, 4096L)) {
      val got = pairs(run(denseMax))
      assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)),
        s"denseMax=$denseMax: expected only (quoted → quoting), got $got")
      assert(got.head._3 == 1.0, s"full quote must score containment 1.0: $got")
    }
    // The dense predicate is vocab AND broadcast budget: a dense vocabulary
    // with a corpus too large to broadcast must fall back to sparse (the
    // bitset table ships to every executor — vocabulary says nothing about
    // row count). Path identified by the dense-only native popcount.
    val dense = run(4096L)
    val fellBack = run(4096L, budget = 1L)
    assert(dense.queryExecution.analyzed.toString.contains("graft_bitand_count"),
      "in-budget dense corpus must take the bitset path")
    assert(!fellBack.queryExecution.analyzed.toString.contains("graft_bitand_count"),
      "over-budget corpus must fall back to the sparse path")
    assert(pairs(fellBack) == pairs(dense), "fallback path must produce identical rows")
  }

  test("wordNgrams yields sliding space-joined grams, empty under n tokens") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(TF.wordNgrams(TF.tokens(col("text")), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("maxRunCount is the max element multiplicity, 0 for empty") {
    val out = Seq(
      Seq("x", "y", "x", "z", "x"), // x appears 3x
      Seq("solo"),
      Seq.empty[String])
      .toDF("arr").select(TF.maxRunCount(col("arr"))).as[Long].collect()
    assert(out.toSeq == Seq(3L, 1L, 0L))
  }

  test("Decontaminate flags only corpus docs sharing an eval n-gram") {
    import graft.text.Decontaminate
    val docs = Seq(
      (0L, "eval", "one two three four five six seven eight nine"),
      (1L, "web", "one two three four five six seven eight nine tail"), // shares 2 distinct 8-grams
      (2L, "web", "completely different words with no overlap at all here"),
      (3L, "web", "short")) // no 8-grams at all
      .toDF("doc_id", "source", "text")
    val hits = Decontaminate.hits(docs, "doc_id", "text", col("source") === "eval", 8)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 2L), s"got $hits")
    val clean = Decontaminate.clean(docs, "doc_id", "text", col("source") === "eval", 8)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(clean == Set(2L, 3L), s"got $clean")
  }

  test("native expressions codegen-compile with fallback disabled") {
    // With spark.sql.codegen.fallback=true (the default), a janino compile
    // error silently demotes the whole stage to interpreted execution —
    // exactly what hid the GramHash60.eval static-forwarder clash (scalac
    // emits no forwarder when the class inherits a method of the same
    // name). Disabling fallback turns any such clash into a hard failure.
    // Isolated session: suites run in parallel inside the forked test JVM,
    // and flipping fallback on the SHARED session would transiently subject
    // other suites' queries to fallback=false — a cross-suite flake risk.
    // newSession() shares the SparkContext but owns its conf (and inherits
    // the registered extensions).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    val ims = s2.implicits
    import ims._
    val docs = Seq((1L, "alpha beta gamma delta epsilon"), (2L, "zeta eta theta"))
      .toDF("doc_id", "text")
    val n = docs
      .withColumn("_hs", TF.gramHashes(col("text"), 8))
      .select(col("doc_id"), TF.winnowSelect(col("_hs"), 4).as("fps"),
        TF.hash60(col("text")).as("h"))
      .count()
    assert(n == 2)
    val emb = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(emb.select(call_function("graft_dot", col("a"), col("b"))).head().getDouble(0) == 11.0)
    val bs = Seq((Seq(0, 65), Seq(1L, 2L))).toDF("rs", "bits")
    assert(bs.select(
        call_function("graft_bitand_count",
          call_function("graft_bitset", col("rs"), lit(2)), col("bits")))
      .head().getInt(0) == 2)
    // graft_bin: #{splits <= v} — below-first=0, at-a-split counts it,
    // above-last=|splits|.
    val binned = Seq(0.5, 1.0, 2.5, 9.0).toDF("v")
      .select(call_function("graft_bin", col("v"),
        lit(Array(1.0, 2.0, 3.0))).as("b"))
      .as[Long].collect().toSeq
    assert(binned == Seq(0L, 1L, 2L, 3L))
    // graft_bpe_encode: the referenced rank map must survive codegen
    val bpe = Seq("there").toDF("t")
      .select(call_function("graft_bpe_encode", col("t"),
        typedLit(Seq("e r", "t h", "th e"))).as("s"))
      .as[Seq[String]].head()
    assert(bpe == Seq("th", "er", "e"))
  }

  test("SimHash: identical docs collide at hamming 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now yes")).toDF("doc_id", "text")
    val pairs = SimHash.nearPairs(
      SimHash.fingerprints(docs, "doc_id", "text"), "doc_id", 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("graft_bitset equals the HOF bitset spelling (the parity-pinned specification)") {
    // The HOF filter+aggregate chain IS the definition; the native
    // expression must reproduce it bit-for-bit, including duplicate and
    // out-of-range ranks.
    val words = 3
    val cases = Seq(
      Seq[Int](),                       // empty → all-zero words
      Seq(0),                           // lowest bit of word 0
      Seq(63, 64, 127, 128, 191),       // word boundaries
      Seq(5, 5, 5),                     // duplicates idempotent
      Seq(191, 0, 100, 100, 63),        // unsorted with duplicates
      Seq(192, 500),                    // out of range → ignored
      (0 until 192).toSeq)              // fully set
    val df = cases.zipWithIndex.map { case (rs, i) => (i.toLong, rs) }
      .toDF("id", "rs")
    val hof = transform(sequence(lit(0), lit(words - 1)), w =>
      aggregate(filter(col("rs"), r => (r / 64).cast("int") === w),
        lit(0L),
        (acc, r) => acc.bitwiseOR(
          call_function("shiftleft", lit(1L), (r % 64).cast("int")))))
    val out = df.select(col("id"),
        call_function("graft_bitset", col("rs"), lit(words)).as("native"),
        hof.as("spec"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    out.foreach { case (i, n, s) =>
      assert(n == s, s"case $i: native $n != spec $s")
    }
    // long-typed rank arrays work too (collect_list over bigint ranks)
    val dfl = Seq((1L, Seq(0L, 64L, 127L))).toDF("id", "rs")
    assert(dfl.select(call_function("graft_bitset", col("rs"), lit(2)))
      .as[Seq[Long]].head() == Seq(1L, java.lang.Long.parseUnsignedLong("8000000000000001", 16)))
  }

  test("LineDedup: first occurrence wins corpus-wide, survivors reassemble in order") {
    val docs = Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),          // beta first seen in doc 1 → only delta survives
      (3L, "beta"),                 // nothing survives
      (4L, "  \nalpha  \nepsilon")) // empty segment dropped; alpha trims to a dup
      .toDF("doc_id", "text")
    val out = graft.text.LineDedup.dedupRollup(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Option[String])].collect().toSeq
    def fp(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out == Seq(
      (1L, 3L, 3L, 1.0, Some(fp("alpha\nbeta\ngamma"))),
      (2L, 2L, 1L, 0.5, Some(fp("delta"))),
      (3L, 1L, 0L, 0.0, None),
      (4L, 2L, 1L, 0.5, Some(fp("epsilon")))))
  }

  test("LineDedup: within-doc repeated lines dedup too (first line_idx wins)") {
    val docs = Seq((7L, "x\nx\ny")).toDF("doc_id", "text")
    val out = graft.text.LineDedup.markLines(docs, "doc_id", "text")
      .orderBy("line_idx").as[(Long, Int, String, Boolean)].collect().toSeq
    assert(out == Seq((7L, 0, "x", true), (7L, 1, "x", false), (7L, 2, "y", true)))
  }

  test("LineDedup: corpus-hot boilerplate line (the skew case) stays exact") {
    // The operator's target shape: ONE line ("Privacy Policy") recurring in
    // ~every document — the hot key the min-struct spelling exists for. At
    // unit scale this proves exactness on the skewed distribution; the
    // PlanSpec q82 pin proves the plan that handles it at 100× (partial_min
    // map-side combine, no Window).
    val n = 5000
    val docs = spark.range(1, n + 1)
      .selectExpr("id AS doc_id",
        "concat('Privacy Policy\\nunique-', id, '\\nPrivacy Policy') AS text")
    val marked = graft.text.LineDedup.markLines(docs, "doc_id", "text")
    // Exactly one survivor of the hot line, in doc 1 at line_idx 0.
    val hot = marked.filter(col("line") === "Privacy Policy")
    assert(hot.count() == 2L * n)
    val kept = hot.filter(col("kept"))
      .select("doc_id", "line_idx").as[(Long, Int)].collect().toSeq
    assert(kept == Seq((1L, 0)), s"hot-line survivor wrong: $kept")
    // Every unique line survives; rollup accounting is exact. Doc 1 keeps
    // its hot line (first occurrence) + its unique line; its second
    // "Privacy Policy" is a within-doc dup. Every other doc keeps only its
    // unique line.
    val roll = graft.text.LineDedup.dedupRollup(docs, "doc_id", "text")
    assert(roll.filter(col("doc_id") === 1 && col("n_kept") === 2).count() == 1)
    assert(roll.filter(col("n_kept") === 1).count() == n - 1)
    assert(roll.agg(sum("n_lines")).as[Long].head() == 3L * n)
  }

  test("qualityCutoff accuracy knob: exact at the test setting, GK-bounded when dialed down") {
    // The default accuracy (QualityCutoffExactAccuracy) puts approx_percentile
    // in its exact regime at test SF; production derives accuracy = 1/ε from a
    // target rank error instead (see the constant's doc). This pins BOTH
    // regimes: default == the exact rank rule; a low-accuracy sketch lands
    // within GK's rank bound (± n/accuracy of rank ceil(q·n)).
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val q = 0.25
    val exact: Map[String, IndexedSeq[Long]] = docs
      .select(col("source"),
        graft.text.TextFunctions.qualityGrid(col("text")).cast("long").as("g"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (s, vs) => s -> vs.map(_._2).sorted.toIndexedSeq }
    def cutoffs(acc: Int): Map[String, Long] =
      graft.queries.TextQueries.qualityCutoff(docs, q, acc)
        .select("source", "cutoff_grid").distinct()
        .as[(String, Long)].collect().toMap
    // default accuracy: cutoff IS the value at 1-indexed rank ceil(q·n)
    cutoffs(graft.queries.TextQueries.QualityCutoffExactAccuracy).foreach {
      case (src, cut) =>
        val vals = exact(src)
        val want = vals(math.ceil(q * vals.size).toInt - 1)
        assert(cut == want, s"$src: exact-regime cutoff $cut != rank-rule $want")
    }
    // low accuracy: the sketch's cutoff sits within the GK rank bound
    val lowAcc = 50
    cutoffs(lowAcc).foreach { case (src, cut) =>
      val vals = exact(src)
      val n = vals.size
      val target = math.ceil(q * n)
      val lo = vals.count(_ < cut) + 1 // rank span the cutoff value occupies
      val hi = vals.count(_ <= cut)
      val eps = n.toDouble / lowAcc
      assert(lo - eps <= target && target <= hi + eps,
        s"$src: low-accuracy cutoff $cut occupies ranks [$lo,$hi], " +
          s"target $target outside ± $eps")
    }
  }

  test("Bloom: inserted keys always hit; random keys mostly miss at the sized rate") {
    val m = 64L * 64L // 4096 bits for 100 keys ≈ 40 bits/key
    val keys = (1L to 100L).toDF("h")
    val bits = graft.functions.Bloom.bits(keys, "h", m)
    val probeAll = keys.crossJoin(broadcast(bits))
      .filter(graft.functions.Bloom.mightContain(col("h"), col("bits"), m))
    assert(probeAll.count() == 100, "bloom has a false negative")
    val misses = (10001L to 11000L).toDF("h").crossJoin(broadcast(bits))
      .filter(graft.functions.Bloom.mightContain(col("h"), col("bits"), m))
      .count()
    assert(misses < 100, s"false-positive rate implausibly high: $misses/1000")
  }

  test("BloomDecontaminate equals Decontaminate exactly, even under a tiny FP-heavy filter") {
    val docs = Tables.documents(spark, sfDir)
    val expected = graft.text.Decontaminate.hits(
        docs, "doc_id", "text", col("source") === "src0", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture has no contamination — spec is vacuous")
    val got = graft.text.BloomDecontaminate.hits(
        docs, "doc_id", "text", col("source") === "src0", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // 1 bit/gram with 6 probes: filter saturates, nearly everything is a
    // candidate — the exact verify must still produce the same answer.
    val fpHeavy = graft.text.BloomDecontaminate.hits(
        docs, "doc_id", "text", col("source") === "src0", 8, bitsPerGram = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fpHeavy == expected)
    // explicit sizing skips the count pass; correctness unchanged even
    // when deliberately undersized
    val sized = graft.text.BloomDecontaminate.hits(
        docs, "doc_id", "text", col("source") === "src0", 8,
        mOverride = Some(1000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sized == expected)
  }

  test("Bloom: an array-bound-exceeding filter size fails named, never empty-and-silent") {
    // past 64 * Int.MaxValue bits numWords overflows Int — an EMPTY filter
    // would return false for everything (bloom false negatives, the one
    // forbidden failure mode); the guard must fire instead
    val tooBig = 64L * (Int.MaxValue.toLong + 1L)
    val e = intercept[IllegalArgumentException] {
      graft.functions.Bloom.bits(Seq(1L).toDF("h"), "h", tooBig)
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
    val viaOverride = intercept[IllegalArgumentException] {
      graft.text.BloomDecontaminate.hits(
        Tables.documents(spark, sfDir), "doc_id", "text",
        col("source") === "src0", 8, mOverride = Some(tooBig)).collect()
    }
    assert(viaOverride.getMessage.contains("exceeds"), viaOverride.getMessage)
  }

  test("BloomDecontaminate: empty eval side yields an empty result, not an error") {
    val docs = Tables.documents(spark, sfDir)
    val out = graft.text.BloomDecontaminate.hits(
      docs, "doc_id", "text", lit(false), 8)
    assert(out.count() == 0)
  }

  test("SpanDedup: finds shared spans, merges touching grams, ignores within-doc repeats") {
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ") // 12-token shared run
    val docs = Seq(
      (1L, s"alpha beta $shared tail1 tail2 tail3"),
      (2L, s"$shared other words here now"),
      // within-doc repetition only — no cross-doc gram, no span
      (3L, ("loop " * 30).trim),
      // too short for any 8-gram
      (4L, "tiny doc"),
      // unrelated
      (5L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val spans = graft.text.SpanDedup.dupSpans(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(s => (s._1, s._2))
    // doc 1: shared run occupies tokens 3..14 → grams at pos 3..7 → span [3, 15)
    // doc 2: tokens 1..12 → grams at pos 1..5 → span [1, 13)
    assert(spans.toSeq == Seq((1L, 3, 15, 12), (2L, 1, 13, 12)), spans.toSeq.toString)
  }

  test("CorpusReport: known corpus produces the hand-computed metric values") {
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared tail1 tail2 tail3", "en"), // 17 toks, 12 span-dup
      (2L, s"$shared other words here now", "en"),         // 16 toks, 12 span-dup
      (3L, "alpha beta gamma", "en"),                      // 3 toks
      (4L, "alpha beta gamma", "de"))                      // exact dup of 3
      .toDF("doc_id", "text", "lang")
    val m = graft.text.CorpusReport.report(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == 4.0)
    assert(m("n_tokens") == 39.0)
    assert(m("exact_dup_docs") == 1.0)
    // 4 single-line docs, one duplicated line → (4-3)/4
    assert(m("dup_line_frac") == 0.25)
    assert(m("span_dup_token_frac") == math.floor(24.0 / 39.0 * 10000 + 0.5) / 10000)
    // shared 8-grams across docs 1/2: pos 3..7 of doc1 == pos 1..5 of doc2 → 5
    assert(m("boilerplate_grams") == 5.0)
    // all four docs predict 'und' (no stopwords) → every label mismatches
    assert(m("langid_mismatch_frac") == 1.0)
    assert(m("mean_quality") > 0.0 && m("mean_quality") < 1.0)
  }

  test("CorpusReport modality-gate rows: hand-computed drop fractions, NULL " +
      "verdict counts dropped, q91 row count pinned (r18)") {
    val docs = Seq(
      (1L, "alpha beta gamma", Some(true), Some(true)),
      (2L, "delta words here", Some(false), Some(true)),   // image dropped
      (3L, "more text rows", None, Some(false)),           // image DECODE FAIL + audio dropped
      (4L, "final doc words", Some(true), None))           // audio DECODE FAIL
      .toDF("doc_id", "text", "image_keep", "audio_keep")
    val m = graft.text.CorpusReport.report(docs, "doc_id", "text",
        langCol = None, imageKeepCol = Some("image_keep"),
        audioKeepCol = Some("audio_keep"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // image: doc2 fails the gate, doc3's verdict is NULL (decode failure —
    // a gate that can't read the member quarantines it) → 2/4
    assert(m("image_gate_drop_frac") == 0.5, m.toString)
    // audio: doc3 fails, doc4 NULL → 2/4
    assert(m("audio_gate_drop_frac") == 0.5, m.toString)
    // the judged q91 report shape: exactly 12 metric rows
    val q91 = SparkEntry.queries("q91_corpus_report")(spark, sfDir)
    assert(q91.count() == 12, "q91 must emit exactly 12 metric rows")
    assert(q91.filter(col("metric").isin(
      "image_gate_drop_frac", "audio_gate_drop_frac")).count() == 2)
  }

  test("contaminationSpans marks the leaked region; doc set equals hits exactly") {
    val leak = (1 to 10).map(i => s"eval$i").mkString(" ")
    val docs = Seq(
      (1L, s"benchmark question here $leak and the answer too", true),
      (2L, s"intro words $leak outro words trailing", false), // leak at 3..12
      (3L, "completely clean training document with original content", false))
      .toDF("doc_id", "text", "is_eval")
    val spans = graft.text.Decontaminate.contaminationSpans(
        docs, "doc_id", "text", col("is_eval"), 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // doc 2: eval run at tokens 3..12 → grams pos 3..5 → span [3, 13)
    assert(spans.toSeq == Seq((2L, 3, 13, 10)), spans.toSeq.toString)
    // the span-level doc set must equal q69's doc-level verdicts
    val sfDocs = Tables.documents(spark, sfDir)
    val spanDocs = graft.text.Decontaminate.contaminationSpans(
        sfDocs, "doc_id", "text", col("source") === "src0", 8)
      .select(col("doc_id")).distinct().as[Long].collect().toSet
    val hitDocs = graft.text.Decontaminate.hits(
        sfDocs, "doc_id", "text", col("source") === "src0", 8)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(spanDocs == hitDocs, s"span docs ${spanDocs.size} != hit docs ${hitDocs.size}")
    assert(hitDocs.nonEmpty, "fixture has no contamination — pin is vacuous")
  }

  test("SpanDedup.stats: complete per-doc rollup, zeros for clean docs") {
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared tail1 tail2 tail3"), // 17 toks, 12 dup
      (2L, s"$shared other words here now"),         // 16 toks, 12 dup
      (3L, "totally clean and unrelated content"))   // 5 toks, 0 dup
      .toDF("doc_id", "text")
    val st = graft.text.SpanDedup.stats(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(st(1L) == ((17, 12L, 1L, 0.7059)), st(1L).toString)
    assert(st(2L) == ((16, 12L, 1L, 0.75)), st(2L).toString)
    assert(st(3L) == ((5, 0L, 0L, 0.0)), st(3L).toString)
  }

  test("SpanDedup: two separated shared regions produce two spans") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val gap = (1 to 10).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $gap $b"),
      (2L, s"$a x1 x2 x3 x4 x5 x6 x7 x8 x9 $b"))
      .toDF("doc_id", "text")
    val spans = graft.text.SpanDedup.dupSpans(docs, "doc_id", "text", 8)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sorted
    // doc 1: a at tokens 1..8 → span [1,9); b at tokens 19..26 → span [19,27)
    assert(spans.toSeq == Seq((1, 9), (19, 27)), spans.toSeq.toString)
  }

  test("Gopher.verdicts: each rule trips on its own boundary case") {
    val fifty = (1 to 48).map(i => s"word$i").mkString(" ") // 48 alpha tokens
    val docs = Seq(
      // 50 tokens (the+the pushes to 50), 2 indicator words → keep
      (1L, s"the the $fifty"),
      // 49 tokens → words_ok false, everything else fine
      (2L, "the the " + (1 to 47).map(i => s"word$i").mkString(" ")),
      // mean word length < 3 (fifty 2-char tokens) → word_len_ok false
      (3L, "the the " + Seq.fill(48)("ab").mkString(" ")),
      // symbol-heavy: 7 '#' on 50 tokens → 70 > 50 → symbol_ok false
      (4L, s"the the $fifty #######"),
      // all 3 lines bullets → bullet_ok false; 2/3 ellipsis → ellipsis_ok false
      (5L, s"- the the $fifty...\n* more...\n- deeper"),
      // numeric tokens: 20 of 50 lack alpha → alpha_ok false
      (6L, "the the " + (1 to 20).map(_.toString).mkString(" ") + " " +
        (1 to 28).map(i => s"w$i").mkString(" ")),
      // only one indicator occurrence → stopword_ok false
      (7L, s"the $fifty extra"))
      .toDF("doc_id", "text")
    val v = graft.text.Gopher.verdicts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) = v(id).getBoolean(v(id).fieldIndex(c))
    assert(b(1, "keep"), v(1).toString)
    assert(!b(2, "words_ok") && !b(2, "keep"))
    assert(b(2, "word_len_ok") && b(2, "stopword_ok"))
    assert(!b(3, "word_len_ok") && b(3, "words_ok"))
    assert(!b(4, "symbol_ok") && b(4, "words_ok"))
    assert(!b(5, "bullet_ok") && !b(5, "ellipsis_ok"))
    assert(!b(6, "alpha_ok") && b(6, "words_ok"))
    assert(!b(7, "stopword_ok") && b(7, "words_ok"))
  }

  test("Gopher.verdicts: empty and degenerate docs produce verdicts, not errors") {
    val docs = Seq((1L, ""), (2L, "###"), (3L, "a b c")).toDF("doc_id", "text")
    val v = graft.text.Gopher.verdicts(docs, "doc_id", "text").collect()
    assert(v.length == 3)
    val byId = v.map(r => r.getLong(0) -> r).toMap
    assert(!byId(1L).getBoolean(byId(1L).fieldIndex("keep")))
    assert(!byId(2L).getBoolean(byId(2L).fieldIndex("symbol_ok")))
  }

  test("Curate.keepSet: exact keeper elected among QUALITY-passing members") {
    // Fingerprint twins straddling the quality floor: extra whitespace
    // doesn't change the normalized fingerprint but LOWERS the score
    // (alpha/punct ratios read raw chars over len(text)). Electing the
    // keeper over all members picks the below-floor min-id variant and
    // the group loses every member; the production order keeps the twin.
    val run = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, run + " " * 400), // whitespace-heavy: same fingerprint, lower score
      (2L, run))
      .toDF("doc_id", "text")
    val grids = docs
      .select(col("doc_id"), graft.text.TextFunctions.qualityGrid(col("text")).as("g"))
      .as[(Long, Long)].collect().toMap
    assert(grids(1L) < grids(2L), s"fixture premise broken: $grids")
    val floorQ = grids(2L).toInt // doc 1 below, doc 2 at the floor
    assert(grids(1L) < floorQ)
    val kept = graft.text.Curate.keepSet(docs, "doc_id", "text",
        minQuality = floorQ)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(2L), s"exact group lost its quality-passing member: $kept")
  }

  test("q98 temperature sampling sits between equalized (q81) and natural mixtures") {
    val sfDir01 = "/root/testdata/sf0.001"
    val q81 = SparkEntry.queries("q81_mixture_sample")(spark, sfDir01)
      .select(col("doc_id")).as[Long].collect().toSet
    val q98 = SparkEntry.queries("q98_temperature_sample")(spark, sfDir01)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    val q98ids = q98.map(_._1).toSet
    // sqrt(x) >= x on [0,1]: every equalized keeper survives temperature
    assert(q81.subsetOf(q98ids), s"q81 ${q81.size} ⊄ q98 ${q98ids.size}")
    val docs = Tables.documents(spark, sfDir01)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nMin = counts.values.min
    // the min stratum keeps EVERYTHING (thr = 10^6); dominant strata damp
    val minLangs = counts.filter(_._2 == nMin).keySet
    val keptBy = q98.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    minLangs.foreach(l => assert(keptBy.getOrElse(l, 0L) == nMin,
      s"min stratum $l must keep all $nMin rows, kept ${keptBy.getOrElse(l, 0L)}"))
    val maxLang = counts.maxBy(_._2)._1
    if (counts(maxLang) > nMin * 2)
      assert(keptBy(maxLang) < counts(maxLang),
        "dominant stratum must be damped below natural")
  }

  test("q103 upsampling lands every stratum within one stratum-size of the majority") {
    val sfDir01 = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q103_mixture_upsample")(spark, sfDir01)
      .select(col("doc_id"), col("lang"), col("copy"))
      .as[(Long, String, Long)].collect()
    val natural = Tables.documents(spark, sfDir01)
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    val maxc = natural.values.max
    val upsampled = out.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    natural.foreach { case (l, c) =>
      // floor(maxc/c)*c <= total <= ceil(maxc/c)*c — the hash threshold
      // moves totals within ±c of the majority, never past it
      assert(upsampled(l) >= (maxc / c) * c && upsampled(l) <= ((maxc + c - 1) / c) * c,
        s"stratum $l: $c natural -> ${upsampled(l)} upsampled, majority $maxc")
    }
    // the majority stratum replicates exactly once (copies = 1, no extras)
    val maxLang = natural.maxBy(_._2)._1
    assert(upsampled(maxLang) == maxc, s"majority must not inflate: ${upsampled(maxLang)}")
    // copies are dense 0..k-1 per doc (replay-stable shard addressing)
    out.groupBy(_._1).foreach { case (id, rows) =>
      val cs = rows.map(_._3).sorted
      assert(cs.head == 0L && cs.last == cs.length - 1L, s"doc $id copies: ${cs.toSeq}")
    }
  }

  test("q104 training separates a synthetic multilingual corpus (train + held-out)") {
    // The testdata corpus's `lang` column labels a SHARED vocabulary (the
    // generator emits the same token set for every language), so real
    // separation is unlearnable there by construction — the q104 oracle
    // pins the scoring machinery on it instead. The TRAINING property
    // needs linguistically distinct classes: build them from the
    // per-language stopword lexicons (the q100 synthetic-corpus
    // discipline).
    import graft.text.{LangClassifier, TextFunctions => TFn}
    val langs = Seq("en", "de", "es", "fr")
    val docs = langs.zipWithIndex.flatMap { case (l, li) =>
      val words = TFn.stopwords(l).toIndexedSeq
      (0 until 12).map { i =>
        val text = (0 until 30)
          .map(j => words((i * 7 + j * 3 + li) % words.size)).mkString(" ")
        (li * 100L + i, text, l)
      }
    }.toDF("doc_id", "text", "lang")
    val train = docs.filter(col("doc_id") % 3 =!= 0)
    val held = docs.filter(col("doc_id") % 3 === 0)
    val w = LangClassifier.train(train, "doc_id", "text", "lang",
      dim = 2048, epochs = 25, lr = 4.0)
    Graft.releaseCaches()
    def accuracy(d: org.apache.spark.sql.DataFrame): Double = {
      val joined = LangClassifier.score(d, "doc_id", "text", w, 2048)
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
      joined.filter(col("pred_lang") === col("lang")).count().toDouble / joined.count()
    }
    assert(accuracy(train) == 1.0, "training corpus must separate exactly")
    assert(accuracy(held) >= 0.9, "held-out accuracy must carry")
  }

  test("SpanDedup.novelty: owners score 1.0, verbatim copies 0.0, partials in between") {
    val block = (1 to 10).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, block),                                 // owns all 3 of its grams
      (2L, block),                                 // verbatim copy: owns none
      (3L, s"$block plus four fresh tokens here"), // mixed
      (4L, "entirely novel content all of it never repeated anywhere else ok"))
      .toDF("doc_id", "text")
    val nv = graft.text.SpanDedup.novelty(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(nv(1L)._4 == 1.0 && nv(2L)._4 == 0.0, s"${nv(1L)} ${nv(2L)}")
    assert(nv(3L)._4 > 0.0 && nv(3L)._4 < 1.0, nv(3L).toString)
    assert(nv(4L)._4 == 1.0)
    // consistency with the trim owner election: novelty 1.0 ⇔ trim
    // removes nothing from that doc
    val trimmed = graft.text.SpanDedup.trim(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("removed_tokens")).as[(Long, Long)].collect().toMap
    nv.foreach { case (id, (_, _, _, f)) =>
      assert((f == 1.0) == (trimmed(id) == 0L), s"doc $id: novelty $f, removed ${trimmed(id)}")
    }
  }

  test("Decontaminate.trim removes exactly the leaked region, keeps the rest") {
    val leak = (1 to 10).map(i => s"bench$i").mkString(" ")
    val docs = Seq(
      (0L, "eval", leak),                                    // the benchmark
      (1L, "web", s"prefix words here then $leak and a suffix tail"),
      (2L, "web", "a completely clean document with no overlap whatsoever"))
      .toDF("doc_id", "source", "text")
    val out = graft.text.Decontaminate.trim(
        docs, "doc_id", "text", col("source") === "eval", 8)
      .as[(Long, Int, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // eval rows are NOT in the output; both web docs are
    assert(out.keySet == Set(1L, 2L))
    val (_, n1, rem1, sp1, t1) = out(1L)
    assert(sp1 == 1L && rem1 == 10L, out(1L).toString)
    assert(t1 == "prefix words here then and a suffix tail", t1)
    assert(n1 == 18) // 4 prefix + 10 leak + 4 suffix tokens
    assert(out(2L)._3 == 0L &&
      out(2L)._5 == "a completely clean document with no overlap whatsoever")
    // the doc set with removals == q69's flagged set
    val flagged = graft.text.Decontaminate.hits(
        docs, "doc_id", "text", col("source") === "eval", 8)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(out.filter(_._2._3 > 0).keySet == flagged)
    // re-running span location on the trimmed corpus finds nothing
    val trimmed = docs.filter(col("source") === "eval")
      .select(col("doc_id"), col("source"), col("text"))
      .unionByName(out.toSeq.sortBy(_._1).map { case (id, r) => (id, "web", r._5) }
        .toDF("doc_id", "source", "text"))
    assert(graft.text.Decontaminate.contaminationSpans(
      trimmed, "doc_id", "text", col("source") === "eval", 8).count() == 0L)
  }

  test("HtmlExtract.mainText: keeps prose, drops nav/ad/footer/script/style") {
    val html = "<html><head><title>t</title><style>p{color:red}</style>" +
      "<script>alert('hidden words that must never surface')</script></head>" +
      "<body><div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a>" +
      " <a href=\"/c\">Contact</a></div>" +
      "<h1>A headline long enough to keep</h1>" +
      "<p>The first real paragraph of the article with plenty of prose " +
      "and even an inline <a href=\"/ref\">reference link</a> inside it.</p>" +
      "<div class=\"ad\"><a href=\"/buy\">BUY NOW CLICK HERE</a></div>" +
      "<p>Second paragraph, also long enough to pass the length rule.</p>" +
      "<div class=\"footer\"><a href=\"/tos\">Terms</a> (c) 2024 example</div>" +
      "</body></html>"
    val out = graft.text.HtmlExtract.mainText(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, Long, Long, Long, String)].head()
    val (_, nBlocks, nKept, keptChars, main) = out
    assert(nKept === 3L, s"headline + 2 paragraphs: $out\n$main")
    assert(main.startsWith("A headline long enough to keep\n"))
    assert(main.contains("reference link"), "inline anchors keep their text")
    assert(!main.contains("Home") && !main.contains("BUY NOW") &&
      !main.contains("Terms") && !main.contains("hidden words") &&
      !main.contains("color:red"), main)
    assert(nBlocks > nKept && keptChars == main.replace("\n", "").length)
  }

  test("HtmlExtract.mainText: every doc emits a row; degenerate inputs survive") {
    val docs = Seq(
      (1L, ""),                                     // no blocks at all
      (2L, "<div><a href=\"/x\">only a link row here</a></div>"), // all dropped
      (3L, "plain text with no markup at all, long enough to keep"))
      .toDF("doc_id", "html")
    val out = graft.text.HtmlExtract.mainText(docs, "doc_id", "html")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._5 == "" && out(1L)._2 == 0L)
    assert(out(2L)._5 == "" && out(2L)._3 == 0L && out(2L)._2 == 1L)
    assert(out(3L)._5 == "plain text with no markup at all, long enough to keep")
  }

  test("HtmlExtract.decodeEntities: named + numeric decode, malformed " +
      "survives, entity-laden text extracts identically to its plain twin") {
    import graft.text.HtmlExtract
    // unit cases through the Column API
    val cases = Seq(
      (1L, "Fish &amp; Chips &lt;tasty&gt;", "Fish & Chips <tasty>"),
      (2L, "caf&eacute; &#233;clair &#xE9;toile", "café éclair étoile"),
      (3L, "a&nbsp;b&shy;c &#160;d", "a bc  d"), // nbsp→space, shy dropped
      (4L, "keep &bogusname; and &amp and &#99999999; and &#xDFFF; as-is",
        "keep &bogusname; and &amp and &#99999999; and &#xDFFF; as-is"),
      (5L, "&amp;nbsp; decodes ONCE", "&nbsp; decodes ONCE"),
      (6L, "no entities here at all", "no entities here at all"))
    val got = cases.toDF("id", "s", "want")
      .select(col("id"), HtmlExtract.decodeEntities(col("s")).as("got"), col("want"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, g, w) => assert(g == w, s"case $id: got '$g'") }
    // the q93 composition: an entity-laden page and its plain twin extract
    // THE SAME main text — so they dedup/tokenize identically downstream
    val prose = "The quick brown fox & friends jump over the lazy dog daily."
    val entitied = "<p>The quick brown fox &amp; friends jump over the lazy" +
      " dog daily.</p><div class=\"nav\"><a href=\"/\">Home&nbsp;&nbsp;page</a></div>"
    val plain = s"<p>$prose</p>" +
      "<div class=\"nav\"><a href=\"/\">Home  page</a></div>"
    val out = HtmlExtract.mainText(
        Seq((1L, entitied), (2L, plain)).toDF("doc_id", "html"), "doc_id", "html")
      .select("main_text", "n_kept", "kept_chars")
      .distinct().collect()
    assert(out.length == 1, s"twin pages must extract identically: ${out.toSeq}")
    assert(out.head.getString(0) == prose)
    // and the fingerprint-level consequence: exact dedup unifies them
    val fps = HtmlExtract.mainText(
        Seq((1L, entitied), (2L, plain)).toDF("doc_id", "html"), "doc_id", "html")
      .select(md5(col("main_text"))).distinct().count()
    assert(fps == 1L)
    // an &nbsp;-padded link block counts as the whitespace it renders as:
    // nav stays link-dense (dropped) even under entity padding
    assert(!out.head.getString(0).contains("Home"))
  }

  test("graft_nfc: decomposed forms compose (Latin, Hangul), composed and " +
      "ASCII are stable, dedup unifies the spellings (q114)") {
    def nfc(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(call_function("graft_nfc", col("t"))).as[String].head()
    assert(nfc("plain ascii stays") == "plain ascii stays")
    assert(nfc("cafe\u0301") == "caf\u00e9", "e + combining acute composes")
    assert(nfc("caf\u00e9") == "caf\u00e9", "composed is a fixed point")
    assert(nfc("n\u0303") == "\u00f1")
    // Hangul jamo compose to the precomposed syllable (the UAX#15 case
    // a Latin-only implementation would miss)
    assert(nfc("\u1100\u1161") == "\uac00")
    // idempotence on a string NFC cannot fully compose (x + combining
    // tilde has no precomposed form and stays two codepoints)
    assert(nfc(nfc("cafe\u0301x\u0303")) == nfc("cafe\u0301x\u0303"))
    assert(nfc("x\u0303") == "x\u0303")
    // the dedup consequence: both spellings fingerprint identically
    val fps = Seq("re\u0301sume\u0301 text", "r\u00e9sum\u00e9 text").toDF("t")
      .select(md5(call_function("graft_nfc", col("t")))).distinct().count()
    assert(fps == 1L)
    // null passes through as SQL null
    assert(Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(call_function("graft_nfc", col("t"))).head().isNullAt(0))
  }

  test("Sitemaps: urlset pages + index refs parse with entity decode; " +
      "robots Sitemap: directives discovered") {
    import graft.text.Sitemaps
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url><loc>https://a.example/p1</loc><lastmod>2024-03-01</lastmod></url>
        <url>
          <loc> https://a.example/p2?a=1&amp;b=2 </loc>
        </url>
        <url><priority>0.5</priority></url>
      </urlset>"""
    val idx = """<sitemapindex>
        <sitemap><loc>https://a.example/sitemap-news.xml</loc></sitemap>
      </sitemapindex>"""
    val got = Sitemaps.entries(
        Seq((1L, xml), (2L, idx)).toDF("doc_id", "xml"), "doc_id", "xml")
      .as[(Long, String, String, String)].collect().toSet
    assert(got == Set(
      (1L, "page", "https://a.example/p1", "2024-03-01"),
      (1L, "page", "https://a.example/p2?a=1&b=2", ""),
      (2L, "sitemap", "https://a.example/sitemap-news.xml", "")), got.toString)
    val robots = Seq(("a.example",
      "User-agent: *\nDisallow: /x\nSitemap: https://a.example/sitemap.xml\n" +
        "sitemap:https://a.example/sitemap2.xml\n"))
      .toDF("domain", "robots_txt")
    val sm = Sitemaps.fromRobots(robots, "domain", "robots_txt")
      .as[(String, String)].collect().toSet
    assert(sm == Set(("a.example", "https://a.example/sitemap.xml"),
      ("a.example", "https://a.example/sitemap2.xml")), sm.toString)
  }

  test("HtmlExtract.links: visible anchors only, resolved + canonicalized, " +
      "non-http filtered") {
    val html = "<html><head><script>var u=\"<a href=\\\"http://evil.io/x\\\">\";" +
      "</script></head><body>" +
      "<a href=\"/\">Home</a>" +                        // root-relative, self
      "<a href=\"#top\">Top</a>" +                      // fragment-only, self
      "<a href=\"mailto:x@y.com\">Mail</a>" +           // filtered scheme
      "<a href=\"javascript:void(0)\">noop</a>" +       // filtered scheme
      "<a href=\"HTTPS://WWW.Other.COM:443/Hub/?utm_source=f\">hub</a>" +
      "<a href=\"//cdn.net/lib\">cdn</a>" +             // protocol-relative
      "<a href=\"../doc/7?ref=1\">sib</a>" +            // ../ climb, query kept
      "</body></html>"
    val docs = Seq((1L, html, "https://src1.example.com/en/doc/42"))
      .toDF("doc_id", "html", "base_url")
    val out = graft.text.HtmlExtract.links(docs, "doc_id", "html", "base_url")
      .orderBy("href")
      .as[(Long, String, String, String, String)].collect()
    // mailto/javascript filtered; the script-embedded evil.io href NEVER
    // appears (it's string data, not a link); 5 visible http(s) anchors stay
    assert(!out.exists(_._4.contains("evil.io")), out.mkString("\n"))
    assert(out.map(_._3).toSeq ==
      Seq("#top", "../doc/7?ref=1", "/", "//cdn.net/lib",
        "HTTPS://WWW.Other.COM:443/Hub/?utm_source=f").sorted, out.mkString("\n"))
    val byHref = out.map(r => r._3 -> r).toMap
    assert(out.forall(_._2 == "src1.example.com")) // src_host from the base
    assert(byHref("/")._4 == "https://src1.example.com")
    assert(byHref("#top")._4 == "https://src1.example.com/en/doc/42")
    assert(byHref("../doc/7?ref=1")._4 ==
      "https://src1.example.com/en/doc/7?ref=1")
    assert(byHref("HTTPS://WWW.Other.COM:443/Hub/?utm_source=f")._4 ==
      "https://other.com/Hub" && byHref("HTTPS://WWW.Other.COM:443/Hub/?utm_source=f")._5 == "other.com")
    assert(byHref("//cdn.net/lib")._4 == "https://cdn.net/lib" &&
      byHref("//cdn.net/lib")._5 == "cdn.net")
  }

  test("HtmlExtract.links: single-quoted and unquoted hrefs extract like " +
      "double-quoted (real-crawl spellings)") {
    // (a literal `"` inside a single-quoted value would truncate at the
    // normalization seam — it's URL-invalid per RFC 3986 §2 anyway; real
    // crawls carry %22)
    val html = "<html><body>" +
      "<a href=\"https://dq.example/a\">dq</a>" +
      "<a href='https://sq.example/b?x=1'>sq</a>" +
      "<a class='nav' href=https://uq.example/c>uq</a>" +
      "<a href = 'https://sp.example/d'>spaced</a>" +
      // a *href-suffixed attribute must NEVER pair as the link target —
      // the real href wins regardless of attribute order
      "<a href=\"https://real.example/e\" data-href=\"https://tracker.example/x\">t1</a>" +
      "<a data-href=\"https://tracker.example/y\" href=\"https://real.example/f\">t2</a>" +
      "</body></html>"
    val docs = Seq((1L, html, "https://base.example/p"))
      .toDF("doc_id", "html", "base_url")
    val got = graft.text.HtmlExtract.links(docs, "doc_id", "html", "base_url")
      .select("target_url").as[String].collect().sorted.toSeq
    assert(got == Seq("https://dq.example/a", "https://real.example/e",
      "https://real.example/f", "https://sp.example/d",
      "https://sq.example/b?x=1", "https://uq.example/c"), got)
  }

  test("HtmlExtract.anchorTexts: inner text per well-formed anchor; " +
      "unclosed anchors skipped, inline markup stripped") {
    val html = "<html><body>" +
      // an UNCLOSED anchor FOLLOWED by a well-formed one: the lookahead
      // stops its span at the next anchor-open, so it yields no text row
      // and never swallows its neighbor's text or credit
      "<a href=\"https://x.example/unclosed2\">no close " +
      "<a href=\"https://x.example/a\">plain text</a>" +
      "<a href=\"https://x.example/b\">has <b>bold</b> inside</a>" +
      "<a href=\"https://x.example/unclosed\">never closes " + // no </a>
      "<p>prose</p>" +
      "</body></html>"
    val docs = Seq((1L, html, "https://base.example/p"))
      .toDF("doc_id", "html", "base_url")
    val got = graft.text.HtmlExtract
      .anchorTexts(docs, "doc_id", "html", "base_url")
      .select("href", "anchor_text").as[(String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("https://x.example/a", "plain text"),
      ("https://x.example/b", "has bold inside")), got.toSeq)
    val links = graft.text.HtmlExtract.links(docs, "doc_id", "html", "base_url")
    assert(links.count() == 4, "links() still counts both unclosed anchors")
  }

  test("HtmlExtract feeds the B block: boilerplate grams vanish downstream") {
    // The direction check the intake step exists for: shared page chrome
    // dominates cross-doc duplicate grams on RAW tag-stripped text, and
    // extraction removes it. Unique prose per doc, identical chrome.
    val mk = (id: Long, body: String) =>
      (id, "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About us now</a>" +
        " <a href=\"/c\">Contact the team today please</a></div>" +
        s"<p>$body</p>" +
        "<div class=\"footer\"><a href=\"/t\">Terms of service and privacy policy" +
        " text for every single page</a></div>")
    val docs = (1L to 6L).map(i => mk(i,
      (1 to 12).map(j => s"unique${i}word$j").mkString(" "))).toDF("doc_id", "html")
    val raw = docs.select(col("doc_id"),
      graft.text.HtmlExtract.stripTags(col("html")).as("text"))
    val extracted = graft.text.HtmlExtract.mainText(docs, "doc_id", "html")
      .select(col("doc_id"), col("main_text").as("text"))
    val before = graft.text.SpanDedup.dupSpans(raw, "doc_id", "text", 8).count()
    val after = graft.text.SpanDedup.dupSpans(extracted, "doc_id", "text", 8).count()
    assert(before >= 6L, s"chrome must duplicate across raw docs: $before")
    assert(after === 0L, s"extracted prose must carry no cross-doc spans: $after")
  }

  // ---- r15: q100 trainable quality classifier ----

  test("QualityClassifier: training separates a labeled corpus, train AND held-out") {
    // Two disjoint vocabularies with shared filler — the learned weights
    // must pick up the discriminative grams, not memorize doc ids.
    val goodVocab = Seq("measured", "analysis", "evidence", "method", "results",
      "carefully", "derived", "structure", "clear", "concise")
    val junkVocab = Seq("click", "here", "buy", "now", "winner", "free",
      "prize", "offer", "limited", "deal")
    val filler = Seq("the", "a", "of", "and", "to")
    val rnd = new scala.util.Random(42)
    def mk(vocab: Seq[String], id: Long): (Long, String, Int) = {
      val words = (1 to 20).map(_ =>
        if (rnd.nextInt(3) == 0) filler(rnd.nextInt(filler.size))
        else vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "), if (vocab == goodVocab) 1 else 0)
    }
    val train = ((1L to 20L).map(mk(goodVocab, _)) ++ (21L to 40L).map(mk(junkVocab, _)))
      .toDF("doc_id", "text", "label")
    val heldOut = ((41L to 50L).map(mk(goodVocab, _)) ++ (51L to 60L).map(mk(junkVocab, _)))
      .toDF("doc_id", "text", "label")
    val w = graft.text.QualityClassifier.train(train, "doc_id", "text", "label",
      dim = 256, epochs = 30, lr = 2.0)
    Graft.releaseCaches()
    def accuracy(docs: org.apache.spark.sql.DataFrame): Double = {
      val scored = graft.text.QualityClassifier.score(docs, "doc_id", "text", w)
        .join(docs.select(col("doc_id"), col("label")), "doc_id")
      val n = scored.count()
      scored.filter(col("pass") === (col("label") === 1)).count().toDouble / n
    }
    assert(accuracy(train) == 1.0, "training set must separate completely")
    assert(accuracy(heldOut) == 1.0, "held-out docs of the same domains must classify")
    // the gate actually learned signal: junk docs score strictly below good
    val logits = graft.text.QualityClassifier.score(heldOut, "doc_id", "text", w)
      .join(heldOut.select(col("doc_id"), col("label")), "doc_id")
      .groupBy(col("label")).agg(min(col("logit")).as("lo"), max(col("logit")).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(logits(0)._2 < logits(1)._1,
      s"junk max ${logits(0)._2} must fall below good min ${logits(1)._1}")
  }

  test("QualityClassifier scoring face: exact vs a driver reference (the oracle's math)") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, "zq")).toDF("doc_id", "text")
    val dim = 512
    val scored = graft.text.QualityClassifier.score(docs, "doc_id", "text",
      graft.text.QualityClassifier.formulaWeights(spark, dim), dim)
      .orderBy("doc_id").collect()
    // driver reference: same grams (unigrams + bigrams), same md5-prefix
    // hash, same dyadic formula — summed in arbitrary order (exactness
    // means order cannot matter)
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def logit(text: String): Double = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val grams = toks ++ (if (toks.size >= 2) toks.zip(toks.tail).map(p => s"${p._1} ${p._2}") else Nil)
      grams.map(g => ((h60(g) % dim) % 17 - 8) / 16.0).sum
    }
    assert(scored(0).getDouble(1) == logit("alpha beta alpha"))
    assert(scored(1).getDouble(1) == 0.0 && !scored(1).getBoolean(2))
    assert(scored(2).getDouble(1) == logit("zq"))
    assert(scored(0).getBoolean(2) == (logit("alpha beta alpha") > 0))
  }
}
