package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.text.{TextFunctions => TF}

/** Decontamination via Bloom prefilter + exact verify — the scale path of
  * [[Decontaminate]] for when the eval-gram SET outgrows a broadcast.
  *
  * q69 broadcasts the eval grams themselves (strings + hash-relation
  * overhead — fine for benchmark suites of MBs). At a 100M-gram eval
  * corpus that broadcast is tens of GB; the Bloom filter of the same set
  * at 16 bits/gram is ~200 MB — a ~30-100× smaller broadcast — and the
  * corpus side is pruned to bloom-HITTING grams (the sized ~0.04% FP rate
  * over clean grams, plus all true hits) BEFORE anything shuffles. The
  * surviving candidates then verify against the true eval-gram set with
  * an ordinary shuffled join: candidate volume is output-sized, so that
  * join is tiny, and AQE broadcasts the eval side anyway when it measures
  * small. No false negatives exist, and the verify removes every false
  * positive — so the result EQUALS [[Decontaminate.hits]] row-for-row
  * (spec-pinned), making the bloom purely a cost optimization with the
  * same oracle.
  *
  * The filter itself is built declaratively ([[graft.functions.Bloom]]) —
  * per-word bit_or partial aggregation, dense assembly in-plan, probe via
  * the repo's proven crossJoin-broadcast bitset shape (q67).
  */
object BloomDecontaminate {

  /** Per-document contamination hits, identical to [[Decontaminate.hits]]:
    * (`idCol`, n_hits) for non-eval documents sharing >= 1 word `n`-gram
    * with the eval side. `bitsPerGram` sizes the filter (FP-rate knob —
    * never a correctness one).
    */
  def hits(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int, bitsPerGram: Int = 16,
      k: Int = Bloom.DefaultK, mOverride: Option[Long] = None): DataFrame = {
    require(bitsPerGram >= 1, s"bitsPerGram must be >= 1, got $bitsPerGram")
    // explode_outer + output-null filter (the MinHash.shingleRows dodge,
    // as Decontaminate.hits): plain explode infers an interpreted filter
    // re-running the tokenize+ngram chain per doc.
    def grams(df: DataFrame): DataFrame =
      // widen: per-doc tokenize+ngram before the first exchange (no-op at
      // scale and on streaming inputs).
      graft.sources.Sources.widen(df, col(idCol)).select(col(idCol),
        explode_outer(TF.wordNgrams(TF.tokens(col(textCol)), n)).as("gram"))
        .filter(col("gram").isNotNull)
    // Consumed by the size count, the filter build, and the exact verify —
    // and deliberately NOT cached here: an operator-internal cache pins
    // executor storage for every caller (the corrected q67 rationale), and
    // its plan canonicalizes equal to q69's eval subtree, so it would
    // silently rewrite OTHER queries' plans through the cache manager. The
    // eval side is benchmark-sized by premise; callers who feed something
    // bigger can cache/persist their eval frame upstream.
    val evalGrams = grams(docs.filter(isEval)).select(col("gram")).distinct()
    // Exact sizing costs one bounded-metadata count pass over the eval
    // side; a caller who knows their suite's size class passes `mOverride`
    // (rounded up to 64 here) and skips that pass — undersizing only
    // raises the FP rate the verify absorbs, never correctness.
    val m = mOverride match {
      case Some(mo) =>
        require(mo >= 64, s"mOverride must be >= 64 bits, got $mo")
        ((mo + 63L) / 64L) * 64L
      case None =>
        val nGrams = evalGrams.count()
        math.max(1024L, ((nGrams * bitsPerGram + 63L) / 64L) * 64L)
    }
    // xxhash64 on the gram string, NOT the oracle-portable md5 hash60: the
    // bloom is invisible to the oracle (the exact verify defines the
    // result), so the probe can use the cheap codegen'd hash — md5 per
    // corpus gram occurrence would dominate the prefilter it feeds.
    val bitsDf = Bloom.bits(
      evalGrams.select(xxhash64(col("gram")).as("h")), "h", m, k)
    val cand = grams(docs.filter(!isEval))
      .crossJoin(broadcast(bitsDf))
      .filter(Bloom.mightContain(xxhash64(col("gram")), col("bits"), m, k))
      .select(col(idCol), col("gram"))
    // Exact verify on the gram STRING (not its hash): removes bloom false
    // positives AND keeps countDistinct semantics identical to q69 even
    // under hash collisions. Deliberately no broadcast hint — the premise
    // is the eval set may not broadcast; AQE upgrades the join when it
    // measures small.
    cand.join(evalGrams, Seq("gram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_hits"))
  }
}
