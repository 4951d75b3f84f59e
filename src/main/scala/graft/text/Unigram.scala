package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramEncode

/** Trainable unigram-LM subword tokenizer (Kudo 2018, the SentencePiece
  * unigram model — the OTHER public tokenizer family next to BPE, q95):
  * instead of greedy merges, a vocabulary of scored pieces is fit by EM
  * and pruned, and encoding picks the Viterbi-max segmentation. Gives the
  * tokenizer stack a second deployable model (s22's drift monitor
  * measures fertility under whichever table is deployed).
  *
  * Split of labor for 100 TB — EXACTLY the q95/q100/q110 train
  * discipline: the distributed half is ONE exact map-side-combined
  * `groupBy(word).count`; the driver half runs bounded EM over the
  * top-`maxWords` rows (deterministic order: count desc, word asc). The
  * ENCODE face is the native codegen'd
  * [[graft.functions.UnigramEncode]] expression — scan-shaped,
  * zero shuffle, constant vocab riding codegen as a referenced object.
  *
  * Training is DETERMINISTIC end to end: seed selection orders by
  * (count desc, piece asc), EM expected counts fold in fixed word order,
  * pruning drops ties lexicographically, and all log-probs use
  * `StrictMath.log` (bit-specified, unlike `Math.log`). The E-step
  * segments with the SAME [[UnigramEncode.viterbi]] the deployed encode
  * runs, so deployment replays training segmentation by construction.
  */
object Unigram {

  /** One scored piece; `logProb` is ln p(piece) under the final model. */
  final case class Piece(piece: String, logProb: Double)

  /** `piece<TAB>logProb` spelling — the [[graft.functions.UnigramEncode]]
    * vocab-literal format.
    */
  def vocabStrings(vocab: Seq[Piece]): Seq[String] =
    vocab.map(p => s"${p.piece}\t${p.logProb}")

  /** Viterbi-best subword array of `tok` under a trained vocabulary, via
    * the native expression — vocab must be a constant.
    */
  def encode(tok: Column, vocab: Seq[Piece]): Column =
    call_function("graft_unigram_encode", tok, typedLit(vocabStrings(vocab)))

  /** Learn a `vocabSize` piece table from the corpus' word-frequency
    * table (bounded-collect distributed face — the q95 discipline).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 256,
      maxPieceLen: Int = 6, maxWords: Int = 1 << 14,
      seedSize: Int = 1 << 13, emIters: Int = 2): Seq[Piece] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // explode_outer + null filter (the MinHash.shingleRows dodge): plain
    // explode infers an interpreted size()>0 filter re-tokenizing per doc.
    val wc = docs
      .select(explode_outer(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)].collect().toSeq
    trainOnCounts(wc, vocabSize, maxPieceLen, seedSize, emIters)
  }

  /** Driver-side unigram training over (word, count) pairs.
    *
    * 1. SEED: every substring of length 1..maxPieceLen, count-weighted;
    *    all single CHARS kept unconditionally (coverage guarantee), plus
    *    the top `seedSize` multi-char substrings by (count desc, asc).
    * 2. EM: E-step Viterbi-segments each word under current scores and
    *    accumulates count-weighted piece usage (Viterbi-EM — the hard-EM
    *    simplification of Kudo's forward-backward, deterministic);
    *    M-step re-scores p(x) = used(x)/Σused (chars floor at 1 so the
    *    fallback alphabet never vanishes).
    * 3. PRUNE: drop unused multi-char pieces, then the lowest-used
    *    quarter (ties drop lexicographically largest) until ≤ vocabSize;
    *    one EM pass between prune rounds re-routes mass onto survivors.
    * 4. `emIters` final EM passes stabilize scores.
    *
    * Output sorted by (usage desc, piece asc) — rank 1 is the workhorse
    * piece, the q95 merge-table reading.
    */
  def trainOnCounts(wordCounts: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 1 << 13,
      emIters: Int = 2): Seq[Piece] = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be positive, got $maxPieceLen")
    if (wordCounts.isEmpty) return Seq.empty

    // ---- seed: substring counts ----
    val subCounts = new java.util.HashMap[String, Long]()
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var len = 1
        while (len <= maxPieceLen && i + len <= w.length) {
          val p = w.substring(i, i + len)
          subCounts.put(p, subCounts.getOrDefault(p, 0L) + c)
          len += 1
        }
        i += 1
      }
    }
    val chars = scala.collection.mutable.TreeSet.empty[String]
    subCounts.keySet.forEach(k => if (k.length == 1) { chars += k; () })
    val multiSeed = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      subCounts.forEach((k, v) => if (k.length > 1) { buf += ((k, v)); () })
      buf.sortBy { case (p, c) => (-c, p) }.take(seedSize).map(_._1)
    }

    // scores: piece → logProb; usage: piece → count-weighted Viterbi use
    var scores = new java.util.HashMap[String, java.lang.Double]()
    val totalSeed = {
      var t = 0.0
      chars.foreach(p => t += subCounts.get(p).toDouble)
      multiSeed.foreach(p => t += subCounts.get(p).toDouble)
      t
    }
    val lnTotalSeed = StrictMath.log(totalSeed)
    chars.foreach(p => scores.put(p,
      StrictMath.log(subCounts.get(p).toDouble) - lnTotalSeed))
    multiSeed.foreach(p => scores.put(p,
      StrictMath.log(subCounts.get(p).toDouble) - lnTotalSeed))

    var maxLen = 1
    scores.keySet.forEach(k => maxLen = math.max(maxLen, k.length))

    // one E-step: count-weighted Viterbi piece usage under current scores
    def usage(): java.util.HashMap[String, Long] = {
      val u = new java.util.HashMap[String, Long]()
      wordCounts.foreach { case (w, c) =>
        UnigramEncode.viterbi(w, scores, maxLen).foreach { p =>
          if (scores.containsKey(p)) u.put(p, u.getOrDefault(p, 0L) + c)
        }
      }
      u
    }
    // M-step: re-score from usage, EVERY piece floored at count 1 — hard
    // (Viterbi) EM would otherwise collapse the vocabulary to its used
    // fixed point in one round (unused pieces die, never to return);
    // flooring keeps unchosen pieces alive at a tiny score so PRUNING is
    // the only removal path and the table lands at exactly `vocabSize`.
    def rescore(u: java.util.HashMap[String, Long]): Unit = {
      val next = new java.util.HashMap[String, java.lang.Double]()
      var total = 0.0
      scores.keySet.forEach { p =>
        total += math.max(u.getOrDefault(p, 0L), 1L).toDouble
      }
      val lnTotal = StrictMath.log(total)
      scores.keySet.forEach { p =>
        next.put(p, StrictMath.log(
          math.max(u.getOrDefault(p, 0L), 1L).toDouble) - lnTotal)
      }
      scores = next
    }

    // prune to vocabSize: the lowest-usage quarter of multi-char pieces
    // per round (ties drop lexicographically largest first), with an EM
    // pass between rounds so mass re-routes onto the survivors
    var u = usage()
    rescore(u)
    var coverageFloor = false
    while (scores.size > vocabSize && !coverageFloor) {
      val multis = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        scores.keySet.forEach(p =>
          if (p.length > 1) { buf += ((p, u.getOrDefault(p, 0L))); () })
        buf.sortBy { case (p, c) => (c, descKey(p)) }
      }
      if (multis.isEmpty) coverageFloor = true // the char alphabet is the floor
      else {
        val excess = scores.size - vocabSize
        val drop = math.min(multis.size,
          math.max(1, math.min(excess, multis.size / 4 + 1)))
        multis.take(drop).foreach { case (p, _) => scores.remove(p) }
        u = usage()
        rescore(u)
      }
    }

    var it = 0
    while (it < emIters) { u = usage(); rescore(u); it += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    scores.keySet.forEach(p => { out += ((p, u.getOrDefault(p, 0L))); () })
    out.sortBy { case (p, c) => (-c, p) }
      .map { case (p, _) => Piece(p, scores.get(p).doubleValue()) }.toSeq
  }

  // sort key that inverts lexicographic order (drop largest first on ties)
  private def descKey(p: String): String =
    new String(p.toCharArray.map(c => (Char.MaxValue - c).toChar))
}
