package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale shape (q72's discipline): one scan → split+posexplode (row count
  * = total lines, linear in corpus bytes) → ONE row_number window
  * partitioned by line hash, where each partition is duplicate-count-sized
  * (never corpus-sized — no single-partition risk at any scale) → per-doc
  * rollup. First occurrence = smallest (doc_id, line_idx), deterministic
  * across runs.
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
    val w = Window.partitionBy(col("_lh")).orderBy(col(idCol), col("line_idx"))
    docs
      .select(col(idCol), posexplode(split(col(textCol), delimRegex))
        .as(Seq("line_idx", "_raw")))
      .select(col(idCol), col("line_idx"), trim(col("_raw")).as("line"))
      .filter(length(col("line")) > 0)
      .withColumn("_lh", md5(col("line")))
      .withColumn("kept", row_number().over(w) === 1)
      .drop("_lh")
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
