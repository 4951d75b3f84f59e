package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import graft.text.Bpe

/** BPE tokenizer gates (q92/q95): training determinism + driver-reference
  * merges, and the replay-equivalence theorem the native encode relies on
  * (min-rank/leftmost single merges == ordered full replay == training
  * segmentation).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("trainOnCounts: hand-computed merges on a tiny vocabulary") {
    // ab×3 + abc×2: pair counts a-b:5, b-c:2 → merge (a,b); then ab-c:2 →
    // merge (ab,c); then no pair with support >= 2.
    val merges = Bpe.trainOnCounts(Seq(("ab", 3L), ("abc", 2L)), numMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", "c")), merges.toString)
    // minCount stops singleton memorization: with every word unique and
    // numMerges unbounded, training must not fuse whole words from count-1
    // pairs.
    val single = Bpe.trainOnCounts(Seq(("xy", 1L), ("zw", 1L)), numMerges = 10)
    assert(single.isEmpty, single.toString)
    // ties break to the lexicographically smallest pair — deterministic
    val tied = Bpe.trainOnCounts(Seq(("dc", 2L), ("ba", 2L)), numMerges = 1)
    assert(tied == Seq(("b", "a")), tied.toString)
  }

  test("train is deterministic end to end (distributed count + driver loop)") {
    val docs = Tables.documents(spark, sfDir)
    val m1 = Bpe.train(docs, "text", numMerges = 16)
    val m2 = Bpe.train(docs, "text", numMerges = 16)
    assert(m1 == m2)
    assert(m1.size == 16, s"corpus supports 16 merges: ${m1.size}")
    // every merge's constituents are single chars or products of strictly
    // lower ranks — the invariant the replay-equivalence theorem needs
    val produced = scala.collection.mutable.Set[String]()
    m1.foreach { case (a, b) =>
      assert(a.length == 1 || produced.contains(a), s"unproduced left $a")
      assert(b.length == 1 || produced.contains(b), s"unproduced right $b")
      produced += (a + b)
    }
  }

  test("native encode replays training segmentation on random corpora") {
    // The theorem under test: the expression's min-rank/leftmost loop ==
    // ordered full replay (trainSegmentation) == the training-time end
    // state, for every training word. Small alphabet → deep merge chains.
    val alpha = Gen.oneOf("a", "b", "c")
    val corpusGen = for {
      nWords <- Gen.choose(2, 10)
      words <- Gen.listOfN(nWords,
        Gen.choose(1, 8).flatMap(l => Gen.listOfN(l, alpha).map(_.mkString)))
      counts <- Gen.listOfN(nWords, Gen.choose(1L, 9L))
    } yield words.distinct.zip(counts)
    check(forAll(corpusGen) { wc =>
      val merges = Bpe.trainOnCounts(wc, numMerges = 12)
      val want = Bpe.trainSegmentation(wc, numMerges = 12)
      merges.isEmpty || {
        val ms = Bpe.mergeStrings(merges)
        val got = wc.map(_._1).toDF("t")
          .select(col("t"), call_function("graft_bpe_encode",
            col("t"), typedLit(ms)).as("s"))
          .as[(String, Seq[String])].collect().toMap
        wc.forall { case (w, _) => got(w) == want(w) }
      }
    })
  }

  test("encode edge cases: empty, single char, unmergeable, non-ASCII") {
    val ms = Seq("e r", "t h", "th e")
    val got = Seq("", "x", "zq", "there", "héllo").toDF("t")
      .select(col("t"), call_function("graft_bpe_encode",
        col("t"), typedLit(ms)).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("") == Seq.empty)
    assert(got("x") == Seq("x"))
    assert(got("zq") == Seq("z", "q"))
    assert(got("there") == Seq("th", "er", "e"))
    assert(got("héllo") == Seq("h", "é", "l", "l", "o"))
  }

  test("encode rejects malformed merge tables at analysis, not per row") {
    def bad(ms: org.apache.spark.sql.Column) =
      intercept[org.apache.spark.sql.AnalysisException](
        Seq("abc").toDF("t")
          .select(call_function("graft_bpe_encode", col("t"), ms)).collect())
    assert(bad(typedLit(Seq("ab"))).getMessage.contains("graft_bpe_encode"))
    assert(bad(typedLit(Seq("a b c"))).getMessage.contains("space-separated"))
    assert(bad(typedLit(Seq("a b", "a b"))).getMessage.contains("duplicate"))
    assert(bad(lit(null).cast("array<string>")).getMessage.contains("null"))
    // non-foldable merge table: the rank map is built once per instance
    val e = intercept[org.apache.spark.sql.AnalysisException](
      Seq(("abc", Seq("a b"))).toDF("t", "ms")
        .select(call_function("graft_bpe_encode", col("t"), col("ms"))).collect())
    assert(e.getMessage.contains("foldable"))
  }

  test("trained encode compresses: fewer subwords than chars, at least one per word") {
    val docs = Tables.documents(spark, sfDir)
    val ms = Bpe.mergeStrings(Bpe.train(docs, "text", numMerges = 64))
    val r = docs
      .select(graft.text.TextFunctions.tokens(col("text")).as("_toks"))
      .withColumn("_enc", transform(col("_toks"),
        t => call_function("graft_bpe_encode", t, typedLit(ms))))
      .select(
        aggregate(transform(col("_toks"), t => length(t)), lit(0L), (a, x) => a + x).as("chars"),
        aggregate(transform(col("_enc"), e => size(e)), lit(0L), (a, x) => a + x).as("bpe"),
        size(col("_toks")).cast("long").as("words"))
      .agg(sum(col("chars")), sum(col("bpe")), sum(col("words")))
      .as[(Long, Long, Long)].head()
    val (chars, bpe, words) = r
    assert(bpe < chars, s"subwords $bpe must compress chars $chars")
    assert(bpe >= words, s"subwords $bpe can never undercut words $words")
  }
}
