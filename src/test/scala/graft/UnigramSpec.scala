package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, TextFunctions, Unigram}
import graft.functions.UnigramEncode

/** q112 unigram-LM tokenizer: the BpeSpec gate set for the other public
  * tokenizer family — determinism, round-trip totality, the compression
  * sandwich vs chars and BPE, native-expression parity, malformed-vocab
  * rejection at analysis.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    ("the", 50L), ("theory", 8L), ("there", 12L), ("thesis", 4L),
    ("ring", 9L), ("bring", 7L), ("string", 11L), ("spring", 3L),
    ("data", 20L), ("database", 6L), ("update", 5L), ("dates", 4L))

  test("trainOnCounts: deterministic, exactly vocabSize pieces, chars kept") {
    val v1 = Unigram.trainOnCounts(fixture, vocabSize = 30)
    val v2 = Unigram.trainOnCounts(fixture, vocabSize = 30)
    assert(v1 == v2, "training must be bit-deterministic")
    assert(v1.size == 30, s"prune must land at vocabSize, got ${v1.size}")
    // coverage guarantee: every training character survives as a piece
    val pieces = v1.map(_.piece).toSet
    val chars = fixture.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // scores are log-probs: all negative, workhorse pieces rank first
    assert(v1.forall(_.logProb < 0.0))
    // the dominant shared prefix becomes a multi-char piece
    assert(pieces.exists(p => p.length > 1 && p.startsWith("th")),
      s"expected a 'th…' piece in ${v1.take(12)}")
  }

  test("viterbi round-trip is TOTAL: concat(encode(x)) == x, unknown " +
      "chars fall back per codepoint") {
    val vocab = Unigram.trainOnCounts(fixture, vocabSize = 30)
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach(p => m.put(p.piece, Double.box(p.logProb)))
    val maxLen = vocab.map(_.piece.length).max
    val cases = Seq("the", "theoretical", "xyzzy", "θεωρία", "naïve",
      "emoji😀mid", "", "q")
    cases.foreach { s =>
      val enc = UnigramEncode.viterbi(s, m, maxLen)
      assert(enc.mkString == s, s"round-trip broke on '$s': ${enc.toSeq}")
    }
    // surrogate pairs never split: the emoji is ONE fallback piece
    val emoji = UnigramEncode.viterbi("😀", m, maxLen)
    assert(emoji.toSeq == Seq("😀"), emoji.toSeq.toString)
    // known text segments into known pieces only (no unk fallback where
    // the alphabet covers): every piece of a trained word is in-vocab
    val encKnown = UnigramEncode.viterbi("theory", m, maxLen)
    assert(encKnown.forall(p => m.containsKey(p)), encKnown.toSeq.toString)
  }

  test("compression sandwich on the real corpus: words <= unigram pieces " +
      "< chars, and unigram-192 beats byte-BPE-64") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = Unigram.train(docs, "text", vocabSize = 192)
    assert(vocab.size == 192)
    val words = docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
    val uni = words.select(col("w"), Unigram.encode(col("w"), vocab).as("ps"))
      .agg(sum(length(col("w"))).as("chars"),
        sum(size(col("ps"))).as("pieces"),
        count(lit(1)).as("nw"),
        sum(when(concat_ws("", col("ps")) =!= col("w"), 1L).otherwise(0L)).as("bad"))
      .head()
    val (chars, pieces, nWords, bad) =
      (uni.getLong(0), uni.getLong(1), uni.getLong(2), uni.getLong(3))
    assert(bad == 0L, s"$bad corpus words failed the Spark-side round-trip")
    assert(pieces >= nWords, "at least one piece per word")
    assert(pieces * 2 < chars, s"trained table must compress: $pieces vs $chars chars")
    // cross-family: a 192-piece unigram table out-compresses 64 byte merges
    val bpeMerges = Bpe.mergeStrings(Bpe.trainBytes(docs, "text", numMerges = 64))
    val bpeTokens = words
      .agg(sum(size(Bpe.encodeBytes(col("w"), bpeMerges)))).head().getLong(0)
    assert(pieces < bpeTokens,
      s"unigram $pieces should beat byte-BPE-64 $bpeTokens on its training corpus")
  }

  test("native expression equals the driver viterbi; malformed vocab " +
      "rejected at analysis") {
    val vocab = Unigram.trainOnCounts(fixture, vocabSize = 30)
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach(p => m.put(p.piece, Double.box(p.logProb)))
    val maxLen = vocab.map(_.piece.length).max
    val words = fixture.map(_._1) ++ Seq("unrelated", "theoretically")
    val viaSpark = words.toDF("w")
      .select(col("w"), Unigram.encode(col("w"), vocab).as("ps"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(viaSpark(w) == UnigramEncode.viterbi(w, m, maxLen).toSeq,
        s"expression/driver mismatch on '$w'")
    }
    // analysis-time rejection, never a per-row failure
    def bad(vocabLit: Seq[String]): Unit = {
      val e = intercept[Exception] {
        Seq("x").toDF("w")
          .select(call_function("graft_unigram_encode", col("w"), typedLit(vocabLit)))
          .collect()
      }
      assert(e.getMessage.contains("graft_unigram_encode"), e.getMessage)
    }
    bad(Seq("nopiece"))          // no tab
    bad(Seq("a\tnotanumber"))    // bad score
    bad(Seq("a\t-1.0", "a\t-2.0")) // duplicate piece
  }
}
