package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.{TextFunctions => TF}

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with an evaluation/benchmark corpus (the n-gram collision rule
  * from the GPT-3 appendix-C / PaLM contamination analyses — public
  * methodology, not a reference-repo operator; it extends the curation
  * family of text/Curate.scala toward the north-star training pipeline).
  *
  * Scale shape (100 TB): the EVAL side is a benchmark suite — megabytes by
  * nature, thousands-to-millions of distinct n-grams — so its distinct-gram
  * set broadcasts, and the corpus side is ONE tokenize+explode pass filtered
  * by the broadcast join before anything shuffles. The only shuffle is the
  * final per-doc aggregation over the (rare) contaminated grams. If an eval
  * set ever outgrew the broadcast threshold, drop the `broadcast` hint and
  * let AQE pick the join; the plan stays one corpus pass either way.
  */
object Decontaminate {

  /** Per-document contamination hits: (`idCol`, n_hits) for every non-eval
    * document sharing >= 1 word `n`-gram with the eval side; clean documents
    * produce no row. `isEval` partitions the input (eval rows are the
    * benchmark; the rest are the corpus under test).
    */
  def hits(docs: DataFrame, idCol: String, textCol: String,
           isEval: Column, n: Int): DataFrame = {
    // explode_outer + output-null filter (the MinHash.shingleRows dodge):
    // plain explode infers a size()>0 filter below the Generate with the
    // tokenize+ngram chain inlined — an interpreted Filter paying the
    // per-doc gram build twice. Grams are concat_ws output, never null.
    def grams(df: DataFrame): DataFrame =
      // widen: per-doc tokenize+ngram before the first exchange (no-op at
      // scale and on streaming inputs).
      graft.sources.Sources.widen(df, col(idCol)).select(col(idCol),
        explode_outer(TF.wordNgrams(TF.tokens(col(textCol)), n)).as("gram"))
        .filter(col("gram").isNotNull)
    val evalGrams = grams(docs.filter(isEval)).select(col("gram")).distinct()
    grams(docs.filter(!isEval))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_hits"))
  }

  /** The decontaminated corpus: non-eval documents with zero eval-gram
    * collisions (eval rows themselves are not part of the output).
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            isEval: Column, n: Int): DataFrame =
    docs.filter(!isEval)
      .join(hits(docs, idCol, textCol, isEval, n).select(col(idCol)),
        Seq(idCol), "left_anti")

  /** Span-LEVEL contamination: for each non-eval document, the maximal
    * token intervals whose `n`-grams appear in the eval side — the
    * surgical alternative to [[clean]]'s whole-document drop (PaLM-style
    * analyses remove or mask the overlapping REGION; dropping a long
    * document for one leaked benchmark sentence wastes the rest).
    * (`idCol`, span_start, span_end, span_tokens), 1-based [start, end).
    *
    * Pure composition of proven parts: [[SpanDedup.postings]] positional
    * gram hashes on the corpus side, the eval side's distinct gram hashes
    * broadcast (benchmark-sized, q69's premise — for an eval suite beyond
    * broadcast, prefilter with [[BloomDecontaminate]] first and span only
    * the flagged docs), [[SpanDedup.mergeSpans]] for the interval merge —
    * so batch dedup, streaming dedup, and contamination spans share one
    * merge definition.
    */
  def contaminationSpans(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int): DataFrame = {
    val corpus = SpanDedup.postings(docs.filter(!isEval), idCol, textCol, n)
    // Same hash spelling as the postings (hash60 over the space-joined
    // gram), so collision behavior is shared — and mirrored in the oracle.
    val evalH = docs.filter(isEval)
      .select(explode_outer(TF.wordNgrams(TF.tokens(col(textCol)), n)).as("gram"))
      .filter(col("gram").isNotNull) // the shingleRows dodge, as in hits()
      .select(TF.hash60(col("gram")).as("h")).distinct()
    SpanDedup.mergeSpans(
      corpus.join(broadcast(evalH), Seq("h"), "left_semi"), idCol, n)
  }

  /** Surgical decontamination — the ACTION face of [[contaminationSpans]]
    * (what [[SpanDedup.trim]] is to q87): rewrite every NON-EVAL document
    * with its eval-overlapping spans REMOVED, in token space, instead of
    * dropping the whole document (one leaked benchmark sentence shouldn't
    * cost a long document — the PaLM-appendix move made executable). Span
    * inventory and removal share [[SpanDedup.applySpanRemoval]]'s
    * reassembly, so q94's rewrite semantics and this one cannot drift.
    * One row per non-eval document: (`idCol`, n_tokens, removed_tokens,
    * n_spans, text_trimmed); clean documents pass through with zero
    * removal (their token-normalized text).
    */
  def trim(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int): DataFrame =
    SpanDedup.applySpanRemoval(docs.filter(!isEval),
      contaminationSpans(docs, idCol, textCol, isEval, n), idCol, textCol)
}
