package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import graft.ops.{AsOf, Graph}

/** Randomized cross-checks: each operator is compared against an
  * independent straight-line implementation (driver-side union-find, naive
  * theta-join) on generated inputs — correctness evidence orthogonal to
  * the fixed DuckDB oracle corpus.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** scalacheck runner (the scalatest bridge isn't in the offline cache):
    * fixed seed for reproducible CI, 12 cases per property (each case runs
    * several Spark jobs).
    */
  private def check(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("Urls.resolve equals java.net.URI.resolve on random reference shapes") {
    // java.net.URI implements the PUBLIC reference-resolution algorithm
    // (RFC 2396, which matches RFC 3986 on all NORMAL relative shapes),
    // so it is a driver-side oracle for the Column fold. The generator
    // stays inside the cases where the two RFC editions agree and
    // production anchors live: dot segments only in PATH-relative refs
    // (2396 resolves absolute-path refs verbatim while 3986 normalizes
    // them — UrlSpec's `/x/../y` fixture pins the 3986 behavior we ship),
    // every `..` has a preceding segment to pop (abnormal climbs past
    // root also differ), final segments are plain (trailing `.`/`..`
    // leave a `/` we canonicalize away), and empty/fragment-only refs
    // are fixture-covered instead.
    val segGen = Gen.oneOf("x", "y", "z")
    val pairGen: Gen[(String, String)] = for {
      nl <- Gen.choose(1, 3)
      labels <- Gen.listOfN(nl, Gen.oneOf("aa", "bb", "cc"))
      nb <- Gen.choose(1, 3)
      bsegs <- Gen.listOfN(nb, Gen.oneOf("s1", "s2", "s3"))
      btrail <- Gen.oneOf("", "/")
      bq <- Gen.oneOf("", "?b=1")
      kind <- Gen.choose(0, 3)
      pre <- Gen.listOfN(2, segGen)
      mid <- Gen.oneOf(Seq.empty[String], Seq("."), Seq(".."))
      last <- segGen
      hq <- Gen.oneOf("", "?k=v")
    } yield {
      val base = s"https://${labels.mkString(".")}/${bsegs.mkString("/")}$btrail$bq"
      val href = kind match {
        case 0 => s"http://ext.example/$last"
        case 1 => s"//other.example/$last$hq"
        case 2 => s"/${(pre :+ last).mkString("/")}$hq"
        case _ => s"${(pre ++ mid :+ last).mkString("/")}$hq"
      }
      (base, href)
    }
    // NoShrink: scalacheck's string shrinker escapes the generator's
    // domain (an empty base is not a resolvable URI on either side).
    check(Prop.forAllNoShrink(Gen.listOfN(30, pairGen)) { pairs =>
      val got = pairs.toDF("b", "h")
        .select(graft.text.Urls.resolve(col("b"), col("h")))
        .as[String].collect().toSeq
      val want = pairs.map { case (b, h) =>
        new java.net.URI(b).resolve(new java.net.URI(h)).toString
      }
      got == want
    })
  }

  test("connectedComponents equals driver-side union-find on random graphs") {
    val edgesGen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 36)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es.filter(e => e._1 != e._2)
    check(forAll(edgesGen) { es =>
      es.isEmpty || {
        val got = Graph.connectedComponents(es.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        // reference: textbook union-find with min-label normalization
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
        val roots = verts.groupBy(find).map { case (_, vs) => vs.min -> vs }
        val expect = roots.flatMap { case (minId, vs) => vs.map(_ -> minId) }.toMap
        got == expect
      }
    })
  }

  test("asofJoin equals the naive theta-join argmax on random series") {
    val ts0 = 1700000000000L
    val gen = for {
      nq <- Gen.choose(0, 12)
      nt <- Gen.choose(1, 12)
      quotes <- Gen.listOfN(nq, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 50), Gen.choose(1, 999)))
      trades <- Gen.listOfN(nt, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 50)))
    } yield (
      // unique per (key, ts): the operator's documented precondition
      quotes.groupBy(q => (q._1, q._2)).values.map(_.head).toList,
      trades.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })
    check(forAll(gen) { case (quotes, trades) =>
      quotes.isEmpty || {
        val qDF = quotes.map { case (k, t, v) =>
          (k.toLong, new Timestamp(ts0 + t * 1000L), v.toDouble)
        }.toDF("key", "qts", "rate")
        val tDF = trades.map { case (id, k, t) =>
          (id, k.toLong, new Timestamp(ts0 + t * 1000L))
        }.toDF("trade_id", "key", "tts")
        val got = AsOf.asofJoin(tDF, qDF, "key", "tts", "qts")
          .select("trade_id", "rate").as[(Long, Option[Double])].collect().toMap
        val expect = trades.map { case (id, k, t) =>
          val best = quotes.filter(q => q._1 == k && q._2 <= t)
            .sortBy(q => (-q._2, 0)).headOption.map(_._3.toDouble)
          id -> best
        }.toMap
        got == expect
      }
    })
  }

  test("FuzzyLink finds every pair within maxDist substitutions (pigeonhole completeness)") {
    val gen = for {
      n <- Gen.choose(3, 10)
      names <- Gen.listOfN(n, Gen.listOfN(12, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
      nMut <- Gen.choose(1, 5)
      muts <- Gen.listOfN(nMut, for {
        src <- Gen.choose(0, n - 1)
        k <- Gen.choose(0, 2)
        positions <- Gen.pick(k, 0 until 12)
        chars <- Gen.listOfN(k, Gen.oneOf('x', 'y', 'z'))
      } yield (src, positions.toList.zip(chars)))
    } yield (names.distinct, muts)
    check(forAll(gen) { case (names, muts) =>
      val master = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val batch = muts.zipWithIndex.flatMap { case ((src, edits), j) =>
        if (src >= names.length) Nil
        else {
          val sb = new StringBuilder(names(src))
          edits.foreach { case (p, c) => sb.setCharAt(p, c) }
          Seq((1000L + j, sb.toString, src.toLong))
        }
      }
      batch.isEmpty || {
        val got = graft.ops.FuzzyLink.linkage(
            batch.map(b => (b._1, b._2)).toDF("key", "name"),
            master.toDF("key", "name"), "key", "name", 9, 2)
          .select("key_a", "key_b").as[(Long, Long)].collect().toSet
        // every (mutant, source) pair is within maxDist substitutions and
        // MUST be found — the pigeonhole guarantee blocking cannot drop
        batch.forall(b => got.contains((b._1, b._3)))
      }
    })
  }

  test("FuzzyLink equals the full Levenshtein≤2 truth on random corpora (incl. shifts)") {
    // Stronger than the substitution property above: the driver-side DP
    // truth includes equal-length insert+delete pairs, so this falsifies
    // any blocking scheme that misses shifts (and any that emits extras).
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val name = Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val gen = for {
      nb <- Gen.choose(1, 4)
      nm <- Gen.choose(2, 8)
      bs <- Gen.listOfN(nb, name)
      ms <- Gen.listOfN(nm, name)
    } yield (bs.distinct, ms.distinct)
    check(forAll(gen) { case (bs, ms) =>
      val batch = bs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val master = ms.zipWithIndex.map { case (s, i) => (1000L + i, s) }
      val got = graft.ops.FuzzyLink.linkage(
          batch.toDF("key", "name"), master.toDF("key", "name"),
          "key", "name", 6, 2)
        .select("key_a", "key_b", "dist").as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (ka, na) <- batch; (kb, nb2) <- master
        d = lev(na, nb2) if d <= 2
      } yield (ka, kb, d)).toSet
      got == want
    })
  }

  test("FuzzyLink finds hamming-opaque insert+delete run shifts (adversarial, deterministic)") {
    // The class a pigeonhole-only blocker drops: equal-length pairs at
    // Levenshtein 2 via one insert + one delete whose hamming distance is
    // the WHOLE length — every tiling segment damaged, so only the
    // deletion-variant pass can block them. Random small-alphabet corpora
    // (above) rarely generate long shifts; these pin the exact shape.
    val pairs = Seq(
      ("abcdabcd", "bcdabcda"), // full rotation: hamming 8, lev 2
      ("xabcdefg", "abcdefgx"), // head char moved to tail
      ("a0001234", "00012345")) // zero-pad run shift (the q50 key shape)
    pairs.foreach { case (a, b) => assert(a.length == b.length) }
    val batch = pairs.zipWithIndex.map { case ((a, _), i) => (i.toLong, a) }
    val master = pairs.zipWithIndex.map { case ((_, b), i) => (1000L + i, b) }
    val got = graft.ops.FuzzyLink.linkage(
        batch.toDF("key", "name"), master.toDF("key", "name"),
        "key", "name", 6, 2)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    pairs.indices.foreach(i =>
      assert(got.contains((i.toLong, 1000L + i)),
        s"missed shift pair ${pairs(i)} — deletion-variant blocking broken"))
  }

  test("winnowing guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    // The SIGMOD'03 local-fingerprinting property the q66 join rides: any
    // common substring of length w + k - 1 (= 11 at k=8, w=4) contributes
    // a full window of identical k-gram hashes on both sides, whose local
    // minimum both documents select.
    val lowerAlpha = Gen.listOfN(11, Gen.choose('a', 'z')).map(_.mkString)
    val gen = for {
      shared <- lowerAlpha
      pre1 <- Gen.listOfN(12, Gen.choose('a', 'z')).map(_.mkString)
      suf1 <- Gen.listOfN(12, Gen.choose('a', 'z')).map(_.mkString)
      pre2 <- Gen.listOfN(12, Gen.choose('a', 'z')).map(_.mkString)
      suf2 <- Gen.listOfN(12, Gen.choose('a', 'z')).map(_.mkString)
    } yield (pre1 + shared + suf1, pre2 + shared + suf2)
    check(forAll(gen) { case (docA, docB) =>
      val fps = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
        .withColumn("_hs", graft.text.TextFunctions.gramHashes(col("text"), 8))
        .select(col("doc_id"),
          explode(graft.text.TextFunctions.winnowSelect(col("_hs"), 4)).as("fp"))
        .as[(Long, Long)].collect()
      val (a, b) = fps.partition(_._1 == 1L)
      a.map(_._2).toSet.intersect(b.map(_._2).toSet).nonEmpty
    })
  }

  test("containment prefix filter equals the quadratic truth on random corpora") {
    // Blocking completeness for the asymmetric join: every ordered pair at
    // containment >= t must survive the prefix probe (and no extras —
    // the verify is exact). Truth computed driver-side on the same
    // distinct-bigram shingle definition.
    val word = Gen.oneOf("red", "blue", "green", "ash", "oak", "elm", "fox", "owl")
    val doc = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, doc))
    def shingleSet(s: String): Set[String] =
      s.split(" ").toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    check(forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      // Both physical paths must equal the truth: denseVocabMax=0 forces
      // the sparse prefix-filter path (these corpora are all dense).
      def run(denseMax: Long) = graft.text.Containment
        .containmentJoin(df, "doc_id", "text", 0.8, denseVocabMax = denseMax)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sets = docs.zipWithIndex.map { case (s, i) => i.toLong -> shingleSet(s) }.toMap
      val want = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
        if a != b && sa.nonEmpty && sa.intersect(sb).size.toDouble / sa.size >= 0.8
      } yield (a, b)).toSet
      run(4096) == want && run(0) == want
    })
  }

  test("bucket caps are sound on random corpora: capped ⊆ exhaustive, equal when buckets fit") {
    // The r10 cap semantics on arbitrary data: dropping over-cap buckets
    // can only REMOVE candidate pairs (never invent them), and when no
    // bucket exceeds the cap the capped result is the exhaustive one —
    // which is why the oracle-SF results stayed bit-identical.
    import graft.text.{MinHash, SimHash}
    val word = Gen.oneOf("sun", "moon", "tide", "rock", "fern", "moss")
    val doc = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = Gen.choose(4, 10).flatMap(n => Gen.listOfN(n, doc))
    check(forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      val sig = MinHash.signature(
        MinHash.shingleRows(MinHash.withShingles(df, "doc_id", "text"), "doc_id"), "doc_id", 8)
      val bands = MinHash.bands(sig, "doc_id", 8, 2)
      def pairs(cap: Option[Int]) = MinHash.candidates(bands, "doc_id", cap)
        .as[(Long, Long)].collect().toSet
      val exhaustive = pairs(None)
      val tight = pairs(Some(2))   // may drop buckets on tiny corpora
      val roomy = pairs(Some(1000)) // no bucket can exceed this here
      val fp = SimHash.fingerprints(df, "doc_id", "text")
      val simEx = SimHash.nearPairs(fp, "doc_id", 5, maxBucket = None)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val simTight = SimHash.nearPairs(fp, "doc_id", 5, maxBucket = Some(2))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      tight.subsetOf(exhaustive) && roomy == exhaustive && simTight.subsetOf(simEx)
    })
  }

  test("containment sparse path fails fast when prefix filtering cannot discriminate") {
    // Every doc shares the same hot shingles (saturated space): each probe's
    // df is the corpus size, so the candidate expansion is quadratic. A low
    // budget must die with the named error instead of running the join; a
    // high budget (and the default at this scale) must run and agree.
    val docs = (1L to 40L).map(i => (i, "common anchor boilerplate line everywhere"))
      .toDF("doc_id", "text")
    def run(budget: Long) = graft.text.Containment
      .containmentJoin(docs, "doc_id", "text", 0.8,
        denseVocabMax = 0, maxSparseCandidates = budget)
    val e = intercept[IllegalArgumentException](run(100).count())
    assert(e.getMessage.contains("containment_join") &&
      e.getMessage.contains("candidate expansion"))
    // 40 docs x 5 probes x df 40 = 8000 expansion rows — the corpus is all
    // mutual containment, so the surviving output is the full 40x39.
    assert(run(10000).count() === 40L * 39)
    assert(run(0).count() === 40L * 39) // 0 disables the guard
  }

  test("incremental (count, sum) state merge equals the one-pass aggregation") {
    // The q62 algebra on random data and a random split point: folding the
    // stored partial state with the new window's partials must equal the
    // full recompute exactly (DECIMAL sums — no float reassociation slack).
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 100000L)))
      split <- Gen.choose(0, 5)
    } yield (rows, split)
    check(forAll(gen) { case (rows, split) =>
      val df = rows.toDF("day", "cents")
        .select(col("day"), (col("cents") / 100.0).cast("decimal(18,2)").as("v"))
      def partial(d: org.apache.spark.sql.DataFrame) =
        d.groupBy("day").agg(count(lit(1)).as("_n"), sum(col("v")).as("_s"))
      val merged = partial(df.filter(col("day") < split))
        .unionByName(partial(df.filter(col("day") >= split)))
        .groupBy("day").agg(sum(col("_n")).as("n"), sum(col("_s")).as("s"))
        .as[(Int, Long, java.math.BigDecimal)].collect()
        .map(r => r._1 -> ((r._2, r._3.stripTrailingZeros))).toMap
      val onePass = df.groupBy("day")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .as[(Int, Long, java.math.BigDecimal)].collect()
        .map(r => r._1 -> ((r._2, r._3.stripTrailingZeros))).toMap
      merged == onePass
    })
  }

  test("skewSafeSum equals the one-phase groupBy sum on random data") {
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 3), Gen.choose(1L, 500L),
        Gen.choose(-100, 100)))
    } yield rows
    check(forAll(gen) { rows =>
      // integral doubles: the two-phase regrouping cannot perturb the sum
      val df = rows.map { case (k, d, v) => (s"k$k", d, v.toDouble) }
        .toDF("key", "dist", "v")
      val two = graft.ops.Skew.skewSafeSum(df, Seq("key"), col("dist"), col("v"), "s")
        .as[(String, Double)].collect().toMap
      val one = df.groupBy("key").agg(sum("v").as("s"))
        .as[(String, Double)].collect().toMap
      two == one
    })
  }

  test("Scd2.merge invariants hold over random update batches") {
    val gen = for {
      nExist <- Gen.choose(1, 8)
      nStage <- Gen.choose(1, 8)
      existing <- Gen.listOfN(nExist, Gen.zip(Gen.choose(0, 5), Gen.choose(1, 99)))
      staged <- Gen.listOfN(nStage, Gen.zip(Gen.choose(0, 5), Gen.choose(1, 99)))
    } yield (existing.groupBy(_._1).map(_._2.head).toList,
      staged.groupBy(_._1).map(_._2.head).toList)
    check(forAll(gen) { case (existing, staged) =>
      val t0 = new Timestamp(1700000000000L)
      val exDF = existing.map { case (k, v) => (k.toLong, v.toDouble, t0,
          null.asInstanceOf[Timestamp], true) }
        .toDF("key", "value", "valid_from", "valid_to", "is_current")
      val stDF = staged.map { case (k, v) => (k.toLong, v.toDouble) }.toDF("key", "value")
      val out = graft.ops.Scd2.merge(exDF, stDF, Seq("key"), Seq("value"),
          lit(new Timestamp(1700000100000L)))
        .select("key", "value", "is_current").as[(Long, Double, Boolean)].collect()
      val currents = out.filter(_._3).groupBy(_._1)
      // exactly one current row per key that appears anywhere
      val allKeys = (existing.map(_._1.toLong) ++ staged.map(_._1.toLong)).toSet
      val oneCurrentEach = allKeys.forall(k => currents.get(k).exists(_.length == 1))
      // the current value is the staged one where staged, else the existing
      val stagedMap = staged.map { case (k, v) => k.toLong -> v.toDouble }.toMap
      val existMap = existing.map { case (k, v) => k.toLong -> v.toDouble }.toMap
      val currentValueRight = allKeys.forall { k =>
        currents(k).head._2 == stagedMap.getOrElse(k, existMap(k))
      }
      // expired rows only exist for keys whose value actually changed
      val expired = out.filter(!_._3).map(_._1).toSet
      val changedKeys = allKeys.filter(k =>
        stagedMap.contains(k) && existMap.contains(k) && stagedMap(k) != existMap(k))
      oneCurrentEach && currentValueRight && expired == changedKeys
    })
  }

  test("pageRank equals the driver-side reference on random graphs") {
    val edgesGen = for {
      n <- Gen.choose(2, 16)
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es.distinct
    check(forAll(edgesGen) { es =>
      es.isEmpty || {
        val got = Graph.pageRank(es.toDF("s", "t"), "s", "t", iters = 4)
          .as[(Long, Double)].collect().toMap
        // reference: dense synchronous iteration, same simplified update
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val n = nodes.size.toDouble
        val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
        var rank = nodes.map(_ -> 1.0 / n).toMap
        for (_ <- 1 to 4) {
          val contrib = es.groupBy(_._2).map { case (t, in) =>
            t -> in.map(e => rank(e._1) / outdeg(e._1)).sum
          }
          rank = nodes.map(v => v -> ((1 - 0.85) / n + 0.85 * contrib.getOrElse(v, 0.0))).toMap
        }
        // sums associate differently across partitions — compare within 1e-12
        got.keySet == rank.keySet &&
          nodes.forall(v => math.abs(got(v) - rank(v)) < 1e-12)
      }
    })
  }

  test("pageRank stays exact across the lazy-composition chunk boundary (12 rounds)") {
    // The default path checkpoints every 8 rounds and composes the rest
    // lazily — 12 fixed rounds cross one checkpoint plus a lazy tail, so
    // this pins that chunking changes nothing but the job structure.
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L), (2L, 3L))
    val got = Graph.pageRank(es.toDF("s", "t"), "s", "t", iters = 12)
      .as[(Long, Double)].collect().toMap
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
    var ref = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 12) {
      val contrib = es.groupBy(_._2).map { case (t, in) =>
        t -> in.map(e => ref(e._1) / outdeg(e._1)).sum
      }
      ref = nodes.map(v => v -> ((1 - 0.85) / n + 0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == ref.keySet &&
      nodes.forall(v => math.abs(got(v) - ref(v)) < 1e-12))
  }

  test("pageRank with dangling redistribution matches the reference and sums to 1") {
    val edgesGen = for {
      n <- Gen.choose(2, 16)
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es.distinct
    check(forAll(edgesGen) { es =>
      es.isEmpty || {
        val got = Graph.pageRank(es.toDF("s", "t"), "s", "t", iters = 4,
            redistributeDangling = true)
          .as[(Long, Double)].collect().toMap
        // reference: dense synchronous iteration, standard dangling-mass
        // re-injection — rank'(v) = (1-d)/N + d*(Σ in + dangling/N)
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val n = nodes.size.toDouble
        val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
        var rank = nodes.map(_ -> 1.0 / n).toMap
        for (_ <- 1 to 4) {
          val dangling = nodes.filterNot(outdeg.contains).map(rank).sum
          val contrib = es.groupBy(_._2).map { case (t, in) =>
            t -> in.map(e => rank(e._1) / outdeg(e._1)).sum
          }
          rank = nodes.map(v => v ->
            ((1 - 0.85) / n + 0.85 * dangling / n
              + 0.85 * contrib.getOrElse(v, 0.0))).toMap
        }
        val close = nodes.forall(v => math.abs(got(v) - rank(v)) < 1e-12)
        // standard semantics: total rank mass is conserved
        val sumsToOne = math.abs(got.values.sum - 1.0) < 1e-9
        got.keySet == rank.keySet && close && sumsToOne
      }
    })
  }

  test("pageRank convergence stop halts early and agrees with the fixed point") {
    // A directed ring is stationary from the start (every node has outdeg
    // 1 and one incoming edge): iteration 1 computes Δ = 0, so tol > 0
    // must stop after exactly one round, well under the iters bound.
    val ring = (0L until 8L).map(i => (i, (i + 1) % 8)).toDF("s", "t")
    val got = Graph.pageRank(ring, "s", "t", iters = 50, tol = 1e-12)
      .as[(Long, Double)].collect().toMap
    assert(Graph.lastPageRankIters == 1,
      s"ring should converge in 1 round, took ${Graph.lastPageRankIters}")
    assert(got.values.forall(r => math.abs(r - 1.0 / 8) < 1e-15))
    // On an asymmetric graph the tol-stopped result must sit at the fixed
    // point: within ~tol·d/(1−d) of a driver-side reference iterated to
    // full convergence. damping 0.5 keeps the Spark-side round count ~20
    // (deltas shrink ~d^k; 0.85 would need ~85 checkpointed rounds — same
    // mechanism, 4× the CI cost).
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
    val stopped = Graph.pageRank(es.toDF("s", "t"), "s", "t",
        iters = 100, damping = 0.5, tol = 1e-6)
      .as[(Long, Double)].collect().toMap
    val itersUsed = Graph.lastPageRankIters
    assert(itersUsed < 60, s"tol stop never fired (ran $itersUsed rounds)")
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
    var ref = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 200) {
      val contrib = es.groupBy(_._2).map { case (t, in) =>
        t -> in.map(e => ref(e._1) / outdeg(e._1)).sum
      }
      ref = nodes.map(v => v -> ((1 - 0.5) / n + 0.5 * contrib.getOrElse(v, 0.0))).toMap
    }
    assert(stopped.keySet == ref.keySet &&
      nodes.forall(v => math.abs(stopped(v) - ref(v)) < 1e-5))
  }

  test("GramHash60.hashStream equals the code-point sliding reference on multi-byte UTF-8") {
    // The single-pass byte-walk must agree with the definitional spelling
    // (hash of each k-code-point window's UTF-8 bytes) on every byte width:
    // ASCII (1), Latin/Greek (2), CJK (3), astral emoji (4 — a surrogate
    // PAIR in the Java string, ONE char to UTF8String).
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{GramHash60, Hash60}
    val chars = Gen.oneOf("a", "b", "é", "ß", "中", "文", "🙂", "🚀", " ")
    val gen = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, chars)
      k <- Gen.choose(1, 9)
    } yield (cs.mkString, k)
    check(forAll(gen) { case (s, k) =>
      val got = GramHash60.hashStream(UTF8String.fromString(s), k)
      val cps = s.codePoints().toArray
      val expect =
        if (cps.length < k) Seq(Hash60.hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        else cps.sliding(k).map(w => Hash60.hash(
          new String(w, 0, w.length).getBytes(java.nio.charset.StandardCharsets.UTF_8))).toSeq
      got.toLongArray().toSeq == expect
    })
  }

  test("GramHash60.hashStream is linear in document length (1 MB doc, bounded wall time)") {
    // Regression pin for the O(n²) substringSQL spelling: locating char i
    // from byte 0 at every position cost ~10^11 byte touches on a 1 MB doc
    // (minutes); the single forward byte-walk is O(n·k) (~10^7) and
    // finishes in well under a second. The 10s bound is ~100× the expected
    // time — loose enough for a contended host, far below the quadratic
    // regime.
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.GramHash60
    val doc = UTF8String.fromString(("lorem ipsum dölor sit amet " * 40000).take(1 << 20))
    GramHash60.hashStream(UTF8String.fromString("warm üp text " * 100), 8) // JIT warm
    val t0 = System.nanoTime()
    val out = GramHash60.hashStream(doc, 8)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.numElements() == doc.numChars() - 7)
    assert(sec < 10.0, f"1 MB hashStream took $sec%.1fs — quadratic regression?")
  }

  test("Baskets.pairs equals the capped quadratic reference on random baskets") {
    val gen = for {
      nb <- Gen.choose(1, 4)
      baskets <- Gen.listOfN(nb, Gen.zip(Gen.choose(0L, 9L),
        Gen.listOf(Gen.choose(0L, 11L))))
      cap <- Gen.choose(2, 6)
    } yield (baskets.flatMap { case (bk, its) => its.map(bk -> _) }, cap)
    check(forAll(gen) { case (rows, cap) =>
      rows.isEmpty || {
        val got = graft.ops.Baskets.pairs(rows.toDF("basket", "item"),
            "basket", "item", maxBasket = cap)
          .as[(Long, Long, Long)].collect().toSet
        val want = rows.groupBy(_._1).flatMap { case (bk, g) =>
          val kept = g.map(_._2).distinct.sorted.take(cap)
          for (i <- kept.indices; j <- i + 1 until kept.size)
            yield (bk, kept(i), kept(j))
        }.toSet
        got == want
      }
    })
  }

  test("LineDedup.dedupRollup equals the driver reference on random corpora") {
    // Small word pool forces cross-document duplicate lines; whitespace
    // and empty segments exercise the drop rule.
    val line = Gen.oneOf("alpha beta", "gamma", "alpha beta", "delta eps",
      "  ", "", "zeta", "gamma")
    val gen = for {
      nd <- Gen.choose(1, 5)
      docs <- Gen.listOfN(nd, Gen.listOf(line))
    } yield docs.zipWithIndex.map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
    def md5hex(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    check(forAll(gen) { docs =>
      docs.isEmpty || {
        val got = graft.text.LineDedup.dedupRollup(
            docs.toDF("doc_id", "text"), "doc_id", "text")
          .as[(Long, Long, Long, Double, Option[String])].collect()
          .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
        val seen = scala.collection.mutable.Set[String]()
        val want = docs.flatMap { case (id, text) =>
          val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
          if (lines.isEmpty) None else {
            val kept = lines.filter(l => seen.add(l))
            val frac = BigDecimal(kept.length.toDouble / lines.length)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            Some(id -> ((lines.length.toLong, kept.length.toLong, frac,
              if (kept.nonEmpty) Some(md5hex(kept.mkString("\n"))) else None)))
          }
        }.toMap
        got == want
      }
    })
  }

  test("GapFill.dense equals the driver reference on random sparse series") {
    val day0 = java.time.LocalDate.of(2024, 3, 1)
    val gen = for {
      nk <- Gen.choose(1, 3)
      rows <- Gen.listOfN(nk * 3, Gen.zip(Gen.choose(1L, 3L),
        Gen.choose(0, 20), Gen.choose(1, 99)))
    } yield rows.map { case (k, d, v) => (k, d, v) }
      .groupBy(r => (r._1, r._2)).values.map(_.head).toList // one row per (key, day)
    check(forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.map { case (k, d, v) =>
          (k, java.sql.Date.valueOf(day0.plusDays(d)), v.toDouble)
        }.toDF("k", "day", "v")
        val got = graft.ops.GapFill.dense(df, "k", "day", "v")
          .as[(Long, java.sql.Date, Double, Option[Double])].collect()
          .map(t => (t._1, t._2.toString) -> ((t._3, t._4))).toMap
        val want = rows.groupBy(_._1).flatMap { case (k, g) =>
          val byDay = g.map(r => r._2 -> r._3.toDouble).toMap
          val (lo, hi) = (g.map(_._2).min, g.map(_._2).max)
          (lo to hi).map { d =>
            val locf = (lo to d).flatMap(byDay.get).lastOption
            (k, day0.plusDays(d).toString) ->
              ((byDay.getOrElse(d, 0.0), locf))
          }
        }.toMap
        got == want
      }
    })
  }

  test("ntileDistributed == window ntile on random coarse-keyed data") {
    // The two-phase range-bucketed spelling must reproduce Spark's ntile
    // distribution exactly: groups smaller than the tile count, heavy
    // value ties (unique tiebreak carries the order), every bucket count
    // from 1 (degenerate: one global bucket) past the partition default.
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      val nGroups = 1 + rnd.nextInt(4)
      val rows = (1 to 300 + rnd.nextInt(500)).map { i =>
        (i.toLong, s"g${rnd.nextInt(nGroups)}", rnd.nextInt(20).toDouble,
          s"payload-$i" * 3, rnd.nextLong()) }
      // The two payload columns are used by NEITHER group nor order: column
      // pruning specializes the counts-branch copy of the ranged subtree
      // differently from the main copy, so this exercises the
      // boundary-consistency contract (both branches must see the SAME
      // bucket assignment), not just the arithmetic.
      val df = rows.toDF("id", "grp", "v", "pay1", "pay2")
      val tiles = 1 + rnd.nextInt(6)
      val order = Seq(col("v").desc, col("id"))
      val viaWindow = df.withColumn("tile",
          ntile(tiles).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("grp")).orderBy(order: _*)))
        .select("id", "tile").as[(Long, Int)].collect().toMap
      for (buckets <- Seq(1, 7)) {
        val viaRange = graft.ops.Windows.ntileDistributed(
            df, Seq("grp"), order, tiles, buckets = buckets)
          .select("id", "tile").as[(Long, Int)].collect().toMap
        assert(viaRange == viaWindow,
          s"trial=$trial tiles=$tiles buckets=$buckets: first diff " +
            viaWindow.collectFirst { case (k, t) if viaRange.get(k) != Some(t) =>
              s"id=$k window=$t range=${viaRange.get(k)}" }.getOrElse(""))
      }
    }
    // output-name collision fails fast
    intercept[IllegalArgumentException](graft.ops.Windows.ntileDistributed(
      Seq((1L, "a", 1.0)).toDF("id", "grp", "tile"), Seq("grp"), Seq(col("id")), 2))
  }

  test("ntileDistributed fails fast on fine-grained and binary group keys") {
    // Fine key: every row its own group — past maxGroups the per-partition
    // count map aborts in the EXECUTOR with the named error, instead of a
    // silent corpus-scale driver collect. (Window-ntile is the right tool
    // there, as the message says.)
    val fine = (1 to 500).map(i => (i.toLong, s"k$i", i.toDouble)).toDF("id", "grp", "v")
    val e = intercept[Exception](graft.ops.Windows.ntileDistributed(
      fine, Seq("grp"), Seq(col("v"), col("id")), 4, buckets = 2, maxGroups = 50)
      .count())
    assert(String.valueOf(e.getMessage) != null)
    def anyMessage(t: Throwable): String = {
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => String.valueOf(c.getMessage)).mkString(" | ")
    }
    assert(anyMessage(e).contains("ntileDistributed"), anyMessage(e).take(300))
    // The same data under the bound passes (sanity: the guard is a bound,
    // not a behavior change).
    val coarse = fine.withColumn("grp", lit("all"))
    assert(graft.ops.Windows.ntileDistributed(
      coarse, Seq("grp"), Seq(col("v"), col("id")), 4, buckets = 2).count() == 500)
    // Binary group key: Seq[Any] equality would be Array reference equality
    // → wrong per-key totals. Rejected at plan time.
    val bin = fine.withColumn("grp", col("grp").cast("binary"))
    val eb = intercept[IllegalArgumentException](graft.ops.Windows.ntileDistributed(
      bin, Seq("grp"), Seq(col("v"), col("id")), 4))
    assert(eb.getMessage.contains("binary"))
  }

  test("graft_bin == #{splits <= v} on random splits/values incl. NaN/infinities") {
    // The z-order rank-binning expression must agree with its one-line
    // definition on every input class: interior values, exact split hits,
    // below-first, above-last, ±Infinity, and NaN (Java compare order:
    // above everything → top bin).
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 6) {
      val splits = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(1000) / 7.0)
        .distinct.sorted
      val vals = Seq.fill(200)(rnd.nextInt(1200) / 7.0 - 10.0) ++
        Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
          splits.head, splits.last)
      val got = vals.toDF("v")
        .select(call_function("graft_bin", col("v"), lit(splits.toArray)).as("b"))
        .as[Long].collect().toSeq
      val want = vals.map(v =>
        splits.count(s => java.lang.Double.compare(s, v) <= 0).toLong)
      assert(got == want, s"splits=${splits.take(5)}...: first diff at " +
        s"${got.zip(want).indexWhere(t => t._1 != t._2)}")
    }
    // A nullable-element splits array fails ANALYSIS: a null split would
    // read as an undefined 0.0 through ArrayData.getDouble and silently
    // mis-bin rows (zorderWriteRanked's splits are null-free by contract).
    val nullableSplits = array(lit(1.0), lit(null).cast("double"))
    val ea = intercept[org.apache.spark.sql.AnalysisException](
      Seq(0.5).toDF("v")
        .select(call_function("graft_bin", col("v"), nullableSplits))
        .collect())
    assert(ea.getMessage.contains("graft_bin"))
  }

  test("WordGramHash60 == the built-ins hash60(concat_ws) spelling, incl. multi-byte UTF-8") {
    val tokGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("héllo", "héllo wörld".split(" ").head, "日本語", "ünïcode", "a"))
    val docGen = for {
      len <- Gen.choose(0, 12)
      toks <- Gen.listOfN(len, tokGen)
      n <- Gen.choose(2, 4)
    } yield (toks, n)
    check(forAll(docGen) { case (toks, n) =>
      val df = Seq(toks.mkString("")).toDF("raw")
        .select(split(col("raw"), "").as("toks"))
      // split("") yields [""]; normalize the empty-doc case to an empty array
      val toksCol = when(lit(toks.isEmpty), array().cast("array<string>"))
        .otherwise(col("toks"))
      val native = df.select(call_function("graft_word_gram_hash60",
        toksCol, lit(n))).as[Seq[Long]].head()
      val hof = df.select(graft.text.SpanDedup.posGramHashes(toksCol, n))
        .as[Seq[(Int, Long)]].head()
      native == hof.map(_._2) && hof.map(_._1) == (1 to native.size)
    })
  }

  test("WordGramHash60 skips null tokens exactly like concat_ws (no orphan joiner)") {
    // [a, null, b] must hash "a b", not "a  b" — the function is a
    // registered SQL function, so arbitrary (null-bearing) token arrays
    // must agree with the documented concat_ws spelling.
    val df = spark.range(1).select(
      array(lit("a"), lit(null).cast("string"), lit("b")).as("toks"))
    val native = df.select(call_function("graft_word_gram_hash60",
      col("toks"), lit(3))).as[Seq[Long]].head()
    val viaConcat = df.select(graft.text.TextFunctions.hash60(
      concat_ws(" ", col("toks")))).as[Long].head()
    assert(native == Seq(viaConcat))
    // all-null gram degenerates to hash60("") — same as concat_ws
    val allNull = spark.range(1).select(
      array(lit(null).cast("string"), lit(null).cast("string")).as("toks"))
    assert(allNull.select(call_function("graft_word_gram_hash60",
        col("toks"), lit(2))).as[Seq[Long]].head() ==
      Seq(allNull.select(graft.text.TextFunctions.hash60(lit(""))).as[Long].head()))
  }

  test("SpanDedup.dupSpans equals the driver reference on random corpora") {
    // Small alphabet forces genuine cross-doc gram collisions; reference
    // is a straight-line sliding-window + interval-merge on the driver.
    val alpha = Vector("a", "b", "c", "d")
    val docGen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 14).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(alpha))))
    } yield docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
    val n = 3
    check(forAll(docGen) { docs =>
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = graft.text.SpanDedup.dupSpans(df, "doc_id", "text", n)
        .as[(Long, Int, Int, Int)].collect().toSet
      // reference
      val grams = docs.map { case (id, ts) =>
        id -> (if (ts.size >= n) ts.sliding(n).zipWithIndex
          .map { case (g, i) => (i + 1, g.mkString(" ")) }.toSeq else Seq.empty)
      }
      val holders = scala.collection.mutable.Map[String, Set[Long]]()
      grams.foreach { case (id, gs) =>
        gs.foreach { case (_, g) => holders(g) = holders.getOrElse(g, Set()) + id } }
      val want = grams.flatMap { case (id, gs) =>
        val hits = gs.collect { case (p, g) if (holders(g) - id).nonEmpty => p }.sorted
        if (hits.isEmpty) Seq.empty
        else {
          val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
          var (start, last) = (hits.head, hits.head)
          hits.tail.foreach { p =>
            if (p > last + n) { spans += ((start, last + n)); start = p }
            last = p
          }
          spans += ((start, last + n))
          spans.map { case (s, e) => (id, s, e, e - s) }
        }
      }.toSet
      got == want
    })
  }

  test("SpanDedup.trim equals the driver reference on random corpora") {
    // Same generator shape as the dupSpans property; the reference elects
    // min-id owners per dup gram, interval-merges foreign hit positions
    // and rewrites the token list on the driver.
    val alpha = Vector("a", "b", "c", "d")
    val docGen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 14).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(alpha))))
    } yield docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
    val n = 3
    check(forAll(docGen) { docs =>
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = graft.text.SpanDedup.trim(df, "doc_id", "text", n)
        .as[(Long, Int, Long, Long, String)].collect()
        .map(r => (r._1, (r._2, r._3, r._4, r._5))).toMap
      // reference
      val grams = docs.map { case (id, ts) =>
        id -> (if (ts.size >= n) ts.sliding(n).zipWithIndex
          .map { case (g, i) => (i + 1, g.mkString(" ")) }.toSeq else Seq.empty)
      }
      val holders = scala.collection.mutable.Map[String, Set[Long]]()
      grams.foreach { case (id, gs) =>
        gs.foreach { case (_, g) => holders(g) = holders.getOrElse(g, Set()) + id } }
      val owner = holders.collect {
        case (g, hs) if hs.size >= 2 => g -> hs.min }
      val want = docs.map { case (id, ts) =>
        val gs = grams.toMap.apply(id)
        val hits = gs.collect {
          case (p, g) if owner.get(g).exists(_ != id) => p }.sorted
        val spans = if (hits.isEmpty) Seq.empty[(Int, Int)] else {
          val buf = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
          var (start, last) = (hits.head, hits.head)
          hits.tail.foreach { p =>
            if (p > last + n) { buf += ((start, last + n)); start = p }
            last = p
          }
          buf += ((start, last + n))
          buf.toSeq
        }
        val removedPos = spans.flatMap { case (s, e) => s until e }.toSet
        val kept = ts.zipWithIndex.collect {
          case (t, i) if !removedPos.contains(i + 1) => t }
        id -> ((ts.size, removedPos.size.toLong, spans.size.toLong,
          kept.mkString(" ")))
      }.toMap
      got == want
    })
  }

  test("SpanDedup.trim output re-runs to zero dup spans (crafted clique)") {
    // Three docs sharing an 8-token boilerplate block plus unique tails:
    // after trimming, only the min-id owner holds the block, so a q87
    // re-run over the rewritten corpus finds nothing.
    val block = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block one extra tail here"),
      (2L, s"$block two other words follow"),
      (3L, s"prefix stuff then $block three"))
      .toDF("doc_id", "text")
    val trimmed = graft.text.SpanDedup.trim(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("text_trimmed"))
    assert(graft.text.SpanDedup.dupSpans(
      trimmed, "doc_id", "text_trimmed", 8).count() === 0L)
    // and the owner kept its block verbatim
    val kept = trimmed.filter(col("doc_id") === 1L)
      .as[(Long, String)].head()._2
    assert(kept.contains("dup1"), kept)
  }

  test("BloomDecontaminate equals Decontaminate on random corpora (any filter size)") {
    // Bigram collisions are common at a 4-token alphabet, and a 1-bit/gram
    // filter saturates — the exact verify must win in every regime.
    val alpha = Vector("x", "y", "z", "w")
    val corpusGen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(alpha))))
      bits <- Gen.oneOf(1, 16)
    } yield (docs.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts.mkString(" "), i % 3 == 0) }, bits)
    check(forAll(corpusGen) { case (docs, bits) =>
      val df = docs.toDF("doc_id", "text", "is_eval")
      val want = graft.text.Decontaminate.hits(df, "doc_id", "text", col("is_eval"), 2)
        .as[(Long, Long)].collect().toSet
      val got = graft.text.BloomDecontaminate.hits(
          df, "doc_id", "text", col("is_eval"), 2, bitsPerGram = bits)
        .as[(Long, Long)].collect().toSet
      got == want
    })
  }

  test("histogram rank rule == approx_percentile exact regime (the s16/q84 contract)") {
    // qualityCutoffSink derives each source's cutoff from a cumulative
    // histogram as "the value at 1-indexed rank ceil(q·n)"; q84 uses
    // approx_percentile at full accuracy. These must be THE SAME function
    // on every distribution — heavy ties, single values, all-equal runs —
    // for every quantile the sink might be configured with.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 8; qv <- Seq(0.25, 0.5, 0.75)) {
      val n = 1 + rnd.nextInt(400)
      val ties = 1 + rnd.nextInt(30) // small value domain → heavy ties
      val vals = Seq.fill(n)(rnd.nextInt(ties).toLong)
      val viaAp = vals.toDF("v")
        .agg(expr(s"approx_percentile(v, $qv, 1000000)")).as[Long].head()
      val rank = math.ceil(qv * n).toLong.max(1L)
      val viaRank = vals.sorted.apply((rank - 1).toInt)
      assert(viaAp == viaRank,
        s"n=$n q=$qv ties=$ties: approx_percentile=$viaAp rank-rule=$viaRank")
    }
  }
}
