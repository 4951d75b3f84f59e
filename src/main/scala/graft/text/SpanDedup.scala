package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.{TextFunctions => TF}

/** Duplicate-substring SPAN detection (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better" — public methodology): find,
  * per document, the contiguous token regions that also occur verbatim in
  * at least one OTHER document. The paper removes such spans from all-but-
  * one occurrence; this operator is the diagnostic face (span inventory),
  * and curation composes it (drop/trim decisions are corpus policy).
  *
  * THE LINEAR MEMBER of the dedup family — the scale story the pair-based
  * faces (q20/q21/q22, MinHash/SimHash buckets) cannot have: no document
  * pair is ever materialized. A positional n-gram posting list is
  * aggregated by gram hash (count of DISTINCT holding docs), grams held by
  * >= 2 docs are semi-joined back, and matched positions merge into spans
  * with one bounded per-document window. A boilerplate gram shared by
  * millions of documents costs its POSTINGS (linear), not its pairs
  * (quadratic) — which is why the band-bucket caps that bound q20-q22 have
  * no analog here; there is nothing quadratic to cap.
  *
  * Per-stage scale shape at 100 TB:
  *  - postings: one tokenize+explode pass, ~n_tokens rows, 16-byte
  *    (pos, hash) payload — no gram strings cross the wire;
  *  - dup grams: distinct (h, doc) + count >= 2 — two linear shuffles on a
  *    60-bit key; map-side combine collapses within-doc repeats first;
  *  - join-back: shuffle semi join on h (the dup-gram side is output-sized;
  *    AQE broadcasts it when it measures small);
  *  - span merge: window partitioned by doc_id — bounded by document
  *    length, never corpus-skewed (the safe window class; contrast q52's
  *    segment-window discussion).
  *
  * Reference lineage: the silver dedup pattern
  * (4_silver/silver_transactions.py:109) generalized from whole-row keys to
  * intra-document substrings.
  */
object SpanDedup {

  /** Positional n-gram hashes, built-ins-only spelling: array of
    * struct(pos, h), pos 1-based; empty for docs shorter than `n` tokens.
    * One-element-lambda bound (the q26 lesson): the token array is
    * evaluated once however the caller spells it, and each gram reads
    * `slice` — constant-cost — off the lambda var. [[postings]] uses the
    * value-identical native [[graft.functions.WordGramHash60]] (no
    * per-gram string concat, one generated call per doc); this spelling
    * is its parity twin (property-pinned).
    */
  private[graft] def posGramHashes(toks: Column, n: Int): Column =
    element_at(
      transform(array(toks), ts =>
        when(size(ts) >= n,
          transform(sequence(lit(1), size(ts) - (n - 1)),
            i => struct(i.as("pos"),
              TF.hash60(concat_ws(" ", slice(ts, i, lit(n)))).as("h"))))
          .otherwise(array().cast("array<struct<pos:int,h:bigint>>"))),
      1)

  /** (`idCol`, pos, h) positional gram-hash postings of `docs` — the
    * native hash stream + `posexplode` (0-based position + 1).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    postingsOf(docs, idCol, TF.tokens(col(textCol)), n)

  /** [[postings]] over a caller-supplied token EXPRESSION — the face a
    * caller that already tokenized (CorpusReport's cached base) uses to
    * skip the second tokenize pass. `toks` is evaluated after the widen,
    * so the per-doc-heavy work still runs at full width on narrow scans.
    */
  private[graft] def postingsOf(docs: DataFrame, idCol: String,
      toks: Column, n: Int): DataFrame =
    // widen: the tokenize+gram-hash pass is per-doc-heavy and runs before
    // the first exchange (no-op at scale and on streaming inputs).
    graft.sources.Sources.widen(docs, col(idCol)).select(col(idCol),
        posexplode_outer(call_function("graft_word_gram_hash60",
          toks, lit(n))).as(Seq("_p0", "h")))
      .filter(col("h").isNotNull)
      .select(col(idCol), (col("_p0") + 1).as("pos"), col("h"))

  /** Merge matched positions (rows of (`idCol`, pos)) into maximal spans:
    * grams overlapping OR touching (a position exactly `n` after the
    * previous match continues the same contiguous duplicated region) form
    * one span. The window partitions by document — bounded by document
    * length, never corpus-skewed. Shared by the batch operator and the
    * streaming face (s18), so both merge identically by construction.
    */
  def mergeSpans(hits: DataFrame, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    val brk = hits.withColumn("_b",
      when(prev.isNull || col("pos") > prev + n, 1).otherwise(0))
    val grp = brk.withColumn("_g",
      sum(col("_b")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grp.groupBy(col(idCol), col("_g"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + n).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** Cross-document duplicate spans: (`idCol`, span_start, span_end,
    * span_tokens) with a 1-based token interval [span_start, span_end).
    * Positions whose n-gram occurs in >= 2 distinct documents merge into
    * maximal spans ([[mergeSpans]]). Documents with no cross-doc gram
    * produce no rows.
    */
  /** Gram hashes held by >= 2 distinct documents of the postings frame —
    * THE duplicate-gram rule, shared by the batch operator and the
    * streaming face's batch-internal half (one definition, like
    * [[mergeSpans]]). distinct-then-count instead of a countDistinct agg:
    * both are two shuffles, but the distinct's map-side combine also
    * collapses within-doc repeats before the wire.
    */
  def dupGrams(postings: DataFrame, idCol: String): DataFrame =
    postings.select(col("h"), col(idCol)).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= 2).select(col("h"))

  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2, got $n")
    val p = postings(docs, idCol, textCol, n)
    mergeSpans(p.join(dupGrams(p, idCol), Seq("h"), "left_semi"), idCol, n)
  }

  /** The ACTION face of [[dupSpans]] — Lee et al.'s actual transformation:
    * remove every duplicated span from all-but-one occurrence and rewrite
    * the corpus. Occurrence granularity is the DOCUMENT, first-occurrence-
    * wins (q82's discipline): each duplicate gram's OWNER is the min-id
    * document holding it; in every other document, positions covered by a
    * foreign dup gram merge into removal spans ([[mergeSpans]] — the exact
    * q87 merge) and those tokens are dropped. The owner keeps its text
    * untouched, so every duplicated region survives exactly once at doc
    * grain. The rewrite is in TOKEN space (lowercased, delimiter-
    * normalized — the grain the grams are defined on): `text_trimmed` is
    * the kept tokens joined by single spaces, the empty string when every
    * token was removed.
    *
    * Returns one row per input document: (`idCol`, n_tokens,
    * removed_tokens, n_spans, text_trimmed).
    *
    * Scale shape = q87's linear story plus three linear joins: owner
    * election is a vocab-sized `min` agg over dup-gram postings (map-side
    * combined — a boilerplate gram held by millions of docs shrinks to one
    * row per map task before the wire); removal positions explode from
    * SPANS (output-sized, each position once — spans are disjoint by
    * construction); the reassembly is a per-doc `collect_list` bounded by
    * document length, window-free. The postings subtree is evaluated
    * twice (dup-gram agg + owner/hit probe) — two linear scans; at corpus
    * scale re-running a projection beats caching a corpus-sized
    * intermediate (the LineDedup rationale).
    */
  def trim(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2, got $n")
    val p = postings(docs, idCol, textCol, n)
    val owners = p.join(dupGrams(p, idCol), Seq("h"), "left_semi")
      .groupBy(col("h")).agg(min(col(idCol)).as("_owner"))
    val foreign = p.join(owners, Seq("h"))
      .filter(col(idCol) =!= col("_owner"))
      .select(col(idCol), col("pos"))
    applySpanRemoval(docs, mergeSpans(foreign, idCol, n), idCol, textCol)
  }

  /** Token-space span-removal rewrite, shared by [[trim]] and
    * [[Decontaminate.trim]]: drop every token of `docs` covered by a span
    * row (`idCol`, span_start, span_end, span_tokens — disjoint per doc,
    * the [[mergeSpans]] contract), reassemble the survivors in order.
    * One row per input doc: (`idCol`, n_tokens, removed_tokens, n_spans,
    * text_trimmed) — the empty string when every token was removed.
    *
    * Removal positions explode from SPANS (output-sized; disjoint means
    * each position appears once); the reassembly is a per-doc
    * `collect_list` bounded by document length (collect_list has no
    * ordering guarantee, so kept tokens ride a (pos, tok) struct sorted
    * after collection); the left joins restore zero-token docs and docs
    * whose EVERY token was removed — every input doc emits a row.
    */
  private[text] def applySpanRemoval(docs: DataFrame, spans: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // explode_outer/posexplode_outer + output-null filters (the postings
    // spelling above, = the MinHash.shingleRows dodge): plain explode
    // infers a size()>0 filter below the Generate that re-evaluates the
    // sequence / tokenize child per row in an interpreted Filter.
    val removed = spans.select(col(idCol),
        explode_outer(sequence(col("span_start"), col("span_end") - 1)).as("pos"))
      .filter(col("pos").isNotNull)
    val toks = docs.select(col(idCol),
        posexplode_outer(TF.tokens(col(textCol))).as(Seq("_p0", "tok")))
      .filter(col("tok").isNotNull)
      .select(col(idCol), (col("_p0") + 1).as("pos"), col("tok"))
    val keptAgg = toks.join(removed, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        _.getField("tok"))).as("_kept"))
    val spanStats = spans.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_tokens")).as("removed_tokens"))
    docs.select(col(idCol), size(TF.tokens(col(textCol))).as("n_tokens"))
      .join(keptAgg, Seq(idCol), "left")
      .join(spanStats, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("_kept"), lit("")).as("text_trimmed"))
  }

  /** Per-document first-occurrence NOVELTY — the asymmetric counterpart
    * of [[stats]]' dup_frac (which is symmetric: both copies of a shared
    * region count as duplicated): each distinct gram is OWNED by its
    * min-id document, and a document's novelty is the fraction of its
    * distinct grams it owns. Early documents score high, later
    * re-statements score low — the contribution ordering corpus-pruning
    * and curriculum policies rank by (and the scoring face of [[trim]]'s
    * owner election: novelty 1.0 ⇔ trim removes nothing).
    *
    * (`idCol`, n_grams, n_novel, novelty_frac) for every document with at
    * least `n` tokens (shorter docs have no grams to own — no row, the
    * dupSpans convention); the ratio rides the tie-free floor grid.
    *
    * Scale: distinct (doc, gram) postings → one vocab-sized min agg
    * (map-side combined) → join-back + per-doc count — all linear, no
    * pairs, no windows.
    */
  def novelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"gram width must be >= 2, got $n")
    val p = postings(docs, idCol, textCol, n)
      .select(col(idCol), col("h")).distinct()
    val owners = p.groupBy(col("h")).agg(min(col(idCol)).as("_owner"))
    p.join(owners, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col(idCol) === col("_owner"), 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        (floor(col("n_novel") * lit(10000.0) / col("n_grams") + 0.5) / 10000.0)
          .as("novelty_frac"))
  }

  /** Per-document rollup of [[dupSpans]]: (`idCol`, n_tokens, dup_tokens,
    * n_spans, dup_frac) for EVERY document — clean docs report 0/0/0.0,
    * so the frame is a complete curation signal (join-free thresholding
    * downstream, the q64/q84 consumption shape). One extra aggregation
    * over the span frame + a left join back to the corpus' token counts.
    */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val perDoc = dupSpans(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    docs.select(col(idCol), size(TF.tokens(col(textCol))).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        round(coalesce(col("dup_tokens"), lit(0L)) /
          greatest(col("n_tokens"), lit(1)), 4).as("dup_frac"))
  }
}
