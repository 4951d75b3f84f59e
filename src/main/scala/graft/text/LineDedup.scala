package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact deduplication across the corpus — the C4/RefinedWeb
  * preprocessing step: a LINE (delimiter-separated segment) that appears in
  * many documents is boilerplate (navigation chrome, license headers,
  * cookie banners), and every occurrence after the FIRST is removed while
  * the rest of each document survives. This is the granularity the
  * document-level (q19) and fixed-size-chunk (q72) dedups bracket but
  * don't cover: segments are variable-length and the operator REASSEMBLES
  * the surviving text, rather than only reporting redundancy.
  * (Reference analog: the silver-layer DQ normalize shape of
  * 4_silver/silver_transactions.py applied at line grain.)
  *
  * Scale shape (q72's discipline): split+posexplode (row count = total
  * lines, linear in corpus bytes) → per-hash `min(struct(doc_id,
  * line_idx))` via `groupBy.agg` → equi-join back to mark survivors.
  * Deliberately NOT `row_number over (partition by hash)`: a window
  * partition is one task's sorted buffer, and the operator's entire
  * premise is that boilerplate lines ("Privacy Policy", nav chrome,
  * license headers) recur across a large fraction of documents — so the
  * hot line's duplicate count is CORPUS-scale, one key would serialize
  * one task, and AQE's skew handling does not split window partitions.
  * The min-struct aggregation partially aggregates map-side (each map
  * task emits ONE row per hash it saw), so the hot key shrinks before
  * the shuffle; the join-back is a plain equi-join (skew-splittable by
  * AQE, no per-key buffering). The lines subtree is computed twice (agg
  * build + join probe — two linear scans, visible as two Generates in
  * the plan); at corpus scale re-running a projection is cheaper than
  * caching a corpus-sized intermediate. First occurrence = smallest
  * (doc_id, line_idx), deterministic across runs.
  *
  * `delimRegex` defaults to newline (the production line grain); corpora
  * without literal newlines pass whatever delimiter defines their segment
  * boundary. Empty/whitespace-only segments are dropped before dedup (they
  * carry no content and would otherwise all collide on one hash — a
  * skew-by-construction key).
  */
object LineDedup {

  /** One row per non-empty line: (`idCol`, line_idx, line, kept) where
    * `kept` marks the corpus-wide first occurrence of the trimmed line.
    */
  def markLines(docs: DataFrame, idCol: String, textCol: String,
      delimRegex: String = "\n"): DataFrame = {
    // posexplode_outer (the MinHash.shingleRows dodge): plain posexplode
    // infers a size()>0 filter re-running the split per doc interpreted;
    // the existing length filter already drops the null row a null text
    // would emit (split output is never empty otherwise).
    val lines = docs
      .select(col(idCol), posexplode_outer(split(col(textCol), delimRegex))
        .as(Seq("line_idx", "_raw")))
      .select(col(idCol), col("line_idx"), trim(col("_raw")).as("line"))
      .filter(length(col("line")) > 0)
      .withColumn("_lh", md5(col("line")))
    // Struct min compares field-by-field = ORDER BY (idCol, line_idx)
    // ascending — the same first-occurrence order the window spelled, now
    // with map-side partial aggregation (see object doc: hot-key safety).
    val firsts = lines.groupBy(col("_lh"))
      .agg(min(struct(col(idCol), col("line_idx"))).as("_first"))
    lines.join(firsts, Seq("_lh"))
      .withColumn("kept",
        struct(col(idCol), col("line_idx")) === col("_first"))
      .select(col(idCol), col("line_idx"), col("line"), col("kept"))
  }

  /** Per-document rollup over a marked line frame (`idCol`, line_idx,
    * line, kept): total lines, surviving lines, survival fraction, and the
    * md5 of the surviving text (kept lines joined by `\n` in original
    * order — the reassembled document). Docs whose every line was seen
    * earlier report n_kept = 0 with a null surviving fingerprint.
    * Exposed separately from [[dedupRollup]] so the streaming face can
    * adjust the kept flag against accumulated state before rolling up.
    */
  def rollup(marked: DataFrame, idCol: String): DataFrame = {
    // Ordered reassembly: collect_list has no ordering guarantee, so kept
    // lines ride a (line_idx, line) struct sorted after collection — the
    // sort is per-doc over that doc's kept lines only.
    val keptLines = array_sort(collect_list(
      when(col("kept"), struct(col("line_idx"), col("line")))))
    marked
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        keptLines.as("_kl"))
      .select(col(idCol), col("n_lines"), col("n_kept"),
        round(col("n_kept") * lit(1.0) / col("n_lines"), 4).as("kept_frac"),
        when(col("n_kept") > 0,
          md5(concat_ws("\n", transform(col("_kl"), _.getField("line")))))
          .as("surviving_fp"))
  }

  /** [[markLines]] + [[rollup]] in one call — the batch operator (q82). */
  def dedupRollup(docs: DataFrame, idCol: String, textCol: String,
      delimRegex: String = "\n"): DataFrame =
    rollup(markLines(docs, idCol, textCol, delimRegex), idCol)
}
