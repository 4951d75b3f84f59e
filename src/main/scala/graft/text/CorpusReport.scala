package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.{TextFunctions => TF}

/** Corpus health report — the diagnostic frame a curator runs BEFORE
  * configuring the pipeline: one (metric, value) row per corpus-level
  * signal, each computed by the same definition its operator family uses
  * (exact-dup fingerprints = q19's, span fractions = q87's, quality grid
  * = q24's, lang-ID = q23's), so the report's numbers are the numbers the
  * downstream operators will act on — not a parallel re-implementation
  * that can drift.
  *
  * Every ratio is an exact-integer division pushed through the tie-free
  * `floor(x·10⁴ + 0.5)/10⁴` grid (the q24 rounding lesson) — `round()` on
  * a float ratio lands on .xxxx5 boundaries where Spark and DuckDB round
  * a ulp apart — and coalesces to 0.0 on an empty corpus (0/0 would
  * surface null metrics to a consumer reading doubles).
  *
  * Scale shape: a fixed number of independent linear aggregations (each a
  * groupBy/distinct over one derived column) plus the q87 span frame —
  * nothing quadratic, nothing collected beyond the ~8-row result; the
  * corpus-wide token total is aggregated ONCE and reused by both rows
  * that need it. The metric set is deliberately cheap; deep diagnostics
  * (cluster size histograms, per-source cutoffs) live in their dedicated
  * operators.
  */
object CorpusReport {

  /** Tie-free 4-decimal grid of an exact-integer-division double; 0.0 on
    * the empty-corpus null.
    */
  private def r4(x: Column): Column =
    coalesce(floor(x * 10000d + 0.5d) / 10000d, lit(0.0))

  /** (metric, value) rows:
    *  - n_docs, n_tokens: corpus size
    *  - exact_dup_docs: docs minus distinct normalized fingerprints (q19)
    *  - dup_line_frac: (lines - distinct lines) / lines (q82's grain)
    *  - span_dup_token_frac: q87 duplicate-span tokens / all tokens
    *  - boilerplate_grams: distinct `n`-grams held by >= 2 docs (q85's rule)
    *  - mean_quality: sum of q24 quality grids / (docs · 10⁴)
    *  - langid_mismatch_frac: `langCol` label != q23 prediction (row
    *    omitted when `langCol` is None — same knob as the SQL twin)
    *  - non_utf8_frac: fraction of docs whose declared/sniffed charset is
    *    not UTF-8 (the i17 intake-mix signal — [[graft.sources.Warc
    *    .htmlDocuments]] emits the column; a corpus arriving 10%
    *    windows-1251 should say so HERE, before langid/quality read it).
    *    Null charsets count as unknown, not non-UTF-8. Row omitted when
    *    `charsetCol` is None (corpora without intake provenance).
    *  - declared_dup_frac: fraction of docs the ARCHIVE declared exact
    *    re-fetches (r17 — a boolean column derived from
    *    [[graft.sources.Warc.revisitEdges]]: the crawler already hashed
    *    the page, so this dedup pressure costs zero content passes).
    *    Nulls count false. Row omitted when `declaredDupCol` is None.
    *  - image_gate_drop_frac / audio_gate_drop_frac (r18): fraction of
    *    docs the modality intake gates DROP — boolean keep-verdict
    *    columns carrying q122's ([[graft.multimodal.Binary.imageStats]]
    *    rules) and q123's (clip rules) verdicts. A NULL verdict is a
    *    decode failure and counts as dropped (a gate that can't read the
    *    member would quarantine it). Rows omitted when the columns are
    *    None — the per-modality attrition a curator monitors, surfaced
    *    in the one report that fronts the pipeline.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
      langCol: Option[String] = Some("lang"), n: Int = 8,
      charsetCol: Option[String] = None,
      declaredDupCol: Option[String] = None,
      imageKeepCol: Option[String] = None,
      audioKeepCol: Option[String] = None): DataFrame = {
    val base = docs.select(col(idCol), col(textCol).as("_text"),
      TF.tokens(col(textCol)).as("_toks"))

    def one(name: String, value: Column, from: DataFrame): DataFrame =
      from.agg(value.as("value")).select(lit(name).as("metric"), col("value"))

    val nDocs = one("n_docs", coalesce(count(lit(1)).cast("double"), lit(0.0)), base)
    val exactDups = one("exact_dup_docs",
      (count(lit(1)) - countDistinct(md5(TF.normalizeText(col("_text")))))
        .cast("double"), base)
    val lines = base.select(explode(split(col("_text"), "\n")).as("_line"))
    val dupLineFrac = one("dup_line_frac",
      r4((count(lit(1)) - countDistinct(col("_line"))) * lit(1.0) / count(lit(1))),
      lines)
    // ONE corpus-wide token total, reused by n_tokens and the span ratio.
    val totToks = base.agg(coalesce(sum(size(col("_toks"))), lit(0L)).as("_tot"))
    val nTokens = totToks.select(lit("n_tokens").as("metric"),
      col("_tot").cast("double").as("value"))
    val spanToks = SpanDedup.dupSpans(docs, idCol, textCol, n)
      .agg(coalesce(sum(col("span_tokens")), lit(0L)).as("_dup"))
    val spanFrac = spanToks.crossJoin(totToks)
      .select(lit("span_dup_token_frac").as("metric"),
        r4(col("_dup") * lit(1.0) / col("_tot")).as("value"))
    val boiler = one("boilerplate_grams", count(lit(1)).cast("double"),
      base.select(col(idCol),
          explode(TF.wordNgrams(col("_toks"), n)).as("_gram")).distinct()
        .groupBy(col("_gram")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") >= 2))
    val meanQ = one("mean_quality",
      r4(sum(TF.qualityGrid(col("_text")).cast("long")) * lit(1.0) /
        (count(lit(1)) * lit(10000L))), base)
    val parts = Seq(nDocs, nTokens, exactDups, dupLineFrac, spanFrac, boiler, meanQ) ++
      langCol.map { lc =>
        require(docs.columns.contains(lc),
          s"corpus report: lang column '$lc' absent from ${docs.columns.mkString(", ")}" +
            " — pass langCol = None to omit the lang-ID row")
        one("langid_mismatch_frac",
          r4(sum(when(col(lc) =!= TF.langPredict(col("_toks")), 1L)
            .otherwise(0L)) * lit(1.0) / count(lit(1))),
          docs.select(col(lc), TF.tokens(col(textCol)).as("_toks")))
      }.toSeq ++
      charsetCol.map { cc =>
        require(docs.columns.contains(cc),
          s"corpus report: charset column '$cc' absent from " +
            s"${docs.columns.mkString(", ")} — pass charsetCol = None to omit")
        one("non_utf8_frac",
          r4(sum(when(col(cc).isNotNull && lower(col(cc)) =!= "utf-8", 1L)
            .otherwise(0L)) * lit(1.0) / count(lit(1))),
          docs.select(col(cc)))
      }.toSeq ++
      declaredDupCol.map { dc =>
        require(docs.columns.contains(dc),
          s"corpus report: declared-dup column '$dc' absent from " +
            s"${docs.columns.mkString(", ")} — pass declaredDupCol = None to omit")
        one("declared_dup_frac",
          r4(sum(when(col(dc) === true, 1L).otherwise(0L)) * lit(1.0) /
            count(lit(1))),
          docs.select(col(dc)))
      }.toSeq ++
      Seq(imageKeepCol.map(("image_gate_drop_frac", _)),
          audioKeepCol.map(("audio_gate_drop_frac", _))).flatten.map {
        case (metric, kc) =>
          require(docs.columns.contains(kc),
            s"corpus report: gate-verdict column '$kc' absent from " +
              s"${docs.columns.mkString(", ")} — pass None to omit")
          // NULL keep = decode failure = dropped
          one(metric,
            r4(sum(when(col(kc) === true, 0L).otherwise(1L)) * lit(1.0) /
              count(lit(1))),
            docs.select(col(kc)))
      }
    parts.reduce(_ unionByName _).orderBy(col("metric"))
  }
}
