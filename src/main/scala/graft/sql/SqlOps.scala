package graft.sql

/** SQL spellings of the relational core — SCD2 merge, dedup-latest,
  * quarantine — each a single `spark.sql`-runnable SELECT whose result (and
  * optimized plan, modulo expression ids) is identical to the Column API
  * (spec-enforced per statement: SqlSurfaceSpec).
  *
  * The reference does exactly these operations in SQL: two `MERGE INTO`
  * statements per silver table (reference:
  * 4_silver/silver_transactions.py:124,153 — expire changed current rows,
  * then insert new current versions) plus windowed dedup on the staged batch
  * (reference: 4_silver/silver_transactions.py:108-118). A notebook-first
  * consumer should not have to leave SQL for these, so each gets a
  * generator here.
  *
  * Why generators returning SELECT text, not a parsed MERGE: open-source
  * Spark over parquet has no transactional MERGE target (the reference gets
  * that from Delta), and graft publishes immutable snapshots
  * ([[graft.sources.Sinks]] `publishVersioned`) rather than mutating tables
  * in place. The same upsert is therefore spelled as a pure SELECT that
  * produces the POST-merge table; the caller publishes it atomically. Rows
  * are identical to the reference's expire+insert pair, with one deliberate
  * fix kept from [[graft.ops.Scd2.merge]]: change detection is null-safe
  * (`<=>`), where the reference's `<>` predicate silently treats NULL
  * attribute transitions as "unchanged".
  *
  * Generated statements interpolate caller-supplied table/column names and
  * SQL fragments verbatim — callers own those strings (same trust model as
  * writing the SQL by hand); column names are backtick-quoted.
  */
object SqlOps {

  private def bt(c: String): String = s"`$c`"

  /** One row per key — the first under `orderSql` (include a unique
    * tiebreak, e.g. `"ts DESC, event_id DESC"`). SQL twin of
    * [[graft.ops.Dedup.latestPerKey]]: same window + `row_number`, one hash
    * shuffle on the key, rank and filter partition-local.
    */
  def dedupLatestSql(table: String, keys: Seq[String], orderSql: String): String = {
    val part = keys.map(bt).mkString(", ")
    s"""SELECT * EXCEPT (_graft_rn) FROM (
       |  SELECT *, row_number() OVER (PARTITION BY $part ORDER BY $orderSql) AS _graft_rn
       |  FROM $table
       |) WHERE _graft_rn = 1""".stripMargin
  }

  /** A named quarantine rule as a SQL predicate (true = failed). SQL twin of
    * [[graft.ops.Quality.Rule]].
    */
  final case class SqlRule(name: String, failedSql: String)

  /** Adds `is_quarantined` / `quarantine_reason` exactly as
    * [[graft.ops.Quality.quarantine]] does — rows are flagged and routable,
    * never dropped. One codegen'd projection; the split is a WHERE on the
    * result (or use [[quarantineSplitSql]]).
    */
  def quarantineSql(table: String, rules: Seq[SqlRule]): String = {
    val preds = rules.map(r => s"(${r.failedSql})")
    val reason = rules.map(r => s"CASE WHEN (${r.failedSql}) THEN '${r.name}' END")
      .mkString("concat_ws(';', ", ", ", ")")
    s"""SELECT *,
       |  ${preds.mkString(" OR ")} AS is_quarantined,
       |  CASE WHEN length($reason) = 0 THEN NULL ELSE $reason END AS quarantine_reason
       |FROM $table""".stripMargin
  }

  /** One side of [[graft.ops.Quality.split]] as a single statement. */
  def quarantineSplitSql(table: String, rules: Seq[SqlRule], quarantined: Boolean): String = {
    val cond = if (quarantined) "is_quarantined" else "NOT is_quarantined"
    s"SELECT * FROM (\n${quarantineSql(table, rules)}\n) WHERE $cond"
  }

  /** One incremental SCD2 merge step as a single SELECT producing the
    * post-merge table. SQL twin of [[graft.ops.Scd2.merge]] — semantics of
    * the reference's two MERGEs (expire changed current rows, insert new
    * current versions), null-safe change detection.
    *
    * `existing` carries (`keys`, `attrs`, `valid_from`, `valid_to`,
    * `is_current`); `staged` carries (`keys`, `attrs`) with at most one row
    * per key (dedupe upstream with [[dedupLatestSql]], as the reference
    * does). Keys must be non-null (a NULL key never matches an equality
    * join — same contract as the Column API). Output columns are
    * `keys ++ attrs ++ (valid_from, valid_to, is_current)`.
    */
  def scd2MergeSql(
      existing: String,
      staged: String,
      keys: Seq[String],
      attrs: Seq[String],
      asOfSql: String): String = {
    val k0 = bt(keys.head)
    val outCols = (keys ++ attrs).map(bt)
    val joinOn = keys.map(k => s"t.${bt(k)} = s.${bt(k)}").mkString(" AND ")
    val changed = attrs.map(a => s"NOT (t.${bt(a)} <=> s.${bt(a)})").mkString("(", " OR ", ")")
    val asOf = s"CAST($asOfSql AS TIMESTAMP)"
    s"""WITH _cur AS (SELECT * FROM $existing WHERE is_current),
       |_expired AS (
       |  SELECT ${outCols.map(c => s"t.$c").mkString(", ")}, t.valid_from,
       |    CASE WHEN s.$k0 IS NOT NULL AND $changed THEN $asOf ELSE t.valid_to END AS valid_to,
       |    CASE WHEN s.$k0 IS NOT NULL AND $changed THEN false ELSE t.is_current END AS is_current
       |  FROM _cur t LEFT JOIN $staged s ON $joinOn),
       |_inserts AS (
       |  SELECT ${outCols.map(c => s"s.$c").mkString(", ")}, $asOf AS valid_from,
       |    CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
       |  FROM $staged s LEFT JOIN _cur t ON $joinOn
       |  WHERE t.$k0 IS NULL OR $changed)
       |SELECT ${outCols.mkString(", ")}, valid_from, valid_to, is_current
       |FROM $existing WHERE NOT is_current
       |UNION ALL SELECT * FROM _expired
       |UNION ALL SELECT * FROM _inserts""".stripMargin
  }

  // ---- B-block spellings (require SqlFunctions.register for graft_*) ----

  /** SQL twin of [[graft.text.Decontaminate.hits]]: per-document count of
    * distinct word `n`-grams shared with the eval side (`evalPredSql` true
    * = benchmark row). Same shape as the Column plan: one tokenize+explode
    * pass, the eval-gram set distinct'd and BROADCAST (benchmarks are
    * MBs by nature), the only shuffle the per-doc distinct-agg. Needs
    * `graft_tokens`/`graft_word_ngrams` ([[SqlFunctions.register]]).
    */
  def decontaminateSql(table: String, idCol: String, textCol: String,
      evalPredSql: String, n: Int): String = {
    val (id, txt) = (bt(idCol), bt(textCol))
    s"""WITH _a AS (
       |  SELECT $id, ($evalPredSql) AS _is_eval,
       |    graft_word_ngrams(graft_tokens($txt), $n) AS _grams
       |  FROM $table),
       |-- UDF in a projection, exploded as a plain column: Spark rejects a
       |-- SQL UDF directly inside a Generate (UNSUPPORTED_SQL_UDF_USAGE)
       |_g AS (SELECT $id, _is_eval, explode(_grams) AS gram FROM _a),
       |_ev AS (SELECT DISTINCT gram FROM _g WHERE _is_eval)
       |SELECT /*+ BROADCAST(_ev) */ $id, count(DISTINCT gram) AS n_hits
       |FROM _g JOIN _ev USING (gram)
       |WHERE NOT _is_eval
       |GROUP BY $id""".stripMargin
  }

  /** SQL twin of q70's Gopher-style repetition signals — duplicate-word
    * fraction and most-repeated-bigram coverage, verdicts spelled as
    * INTEGER cross-multiplications (bit-identical across engines, no float
    * threshold), all doc-local (pure map, zero shuffle). Thresholds are
    * q70's calibrated 13/20 (~p80) and 2/25 (~p95).
    */
  def repetitionSql(table: String, idCol: String, textCol: String): String = {
    val (id, txt) = (bt(idCol), bt(textCol))
    s"""WITH _t AS (SELECT $id, graft_tokens($txt) AS toks FROM $table),
       |_m AS (SELECT $id,
       |    cast(size(toks) AS BIGINT) AS n_tokens,
       |    cast(size(array_distinct(toks)) AS BIGINT) AS n_types,
       |    graft_max_run_count(graft_word_bigrams(toks)) AS top_bigram_cnt
       |  FROM _t)
       |SELECT $id, n_tokens, n_types, top_bigram_cnt,
       |  CASE WHEN (n_tokens - n_types) * 20 > n_tokens * 13
       |         OR top_bigram_cnt * 25 > n_tokens * 2
       |  THEN 1L ELSE 0L END AS repetitive
       |FROM _m""".stripMargin
  }

  /** SQL SEMANTIC spelling of [[graft.ops.ShardPack.assign]]: shard =
    * global running weight total before this row, integer-`div`d by the
    * budget. The single global window here is the DEFINITION (one
    * partition — fine for notebook exploration at moderate scale); a
    * 100 TB run must go through ShardPack's two-phase distributed prefix
    * sum instead, which produces identical rows (spec-pinned).
    */
  def shardPackSql(table: String, idCol: String, weightCol: String,
      budget: Long): String = {
    require(budget > 0, s"budget must be positive, got $budget")
    val (id, wc) = (bt(idCol), bt(weightCol))
    s"""SELECT $id, $wc,
       |  coalesce(sum($wc) OVER (ORDER BY $id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L)
       |    div ${budget}L AS shard_id
       |FROM $table""".stripMargin
  }

  /** SQL twin of q82's line-level exact dedup
    * ([[graft.text.LineDedup.dedupRollup]]): delimiter-split lines,
    * corpus-wide first-occurrence-wins over line hashes (per-hash
    * `min(struct(id, line_idx))` + join-back, NOT a row_number window —
    * a boilerplate line's duplicate count is corpus-scale and a window
    * partition is one task's buffer; the min-struct agg shrinks the hot
    * key map-side, exactly as the Column spelling), per-doc rollup with
    * the surviving text reassembled IN ORDER (array_sort over
    * (line_idx, line) structs — collect_list alone has no order
    * guarantee, exactly as in the Column spelling). `delimRegex` is
    * embedded as a SQL string literal — callers own escaping (same trust
    * model as the other generators).
    */
  def lineDedupSql(table: String, idCol: String, textCol: String,
      delimRegex: String = "\\n"): String = {
    val (id, txt) = (bt(idCol), bt(textCol))
    s"""WITH _l0 AS (
       |  SELECT $id, posexplode(split($txt, '$delimRegex')) AS (line_idx, _raw)
       |  FROM $table),
       |_l AS (SELECT $id, line_idx, trim(_raw) AS line
       |  FROM _l0 WHERE length(trim(_raw)) > 0),
       |_h AS (SELECT *, md5(line) AS _lh FROM _l),
       |_f AS (SELECT _lh, min(struct($id, line_idx)) AS _first
       |  FROM _h GROUP BY _lh),
       |_k AS (SELECT _h.$id, _h.line_idx, _h.line,
       |    struct(_h.$id, _h.line_idx) = _f._first AS kept
       |  FROM _h JOIN _f ON _h._lh = _f._lh)
       |SELECT $id, count(*) AS n_lines,
       |  sum(CASE WHEN kept THEN 1L ELSE 0L END) AS n_kept,
       |  round(sum(CASE WHEN kept THEN 1L ELSE 0L END) * 1.0 / count(*), 4)
       |    AS kept_frac,
       |  CASE WHEN sum(CASE WHEN kept THEN 1L ELSE 0L END) > 0
       |    THEN md5(concat_ws('\\n', transform(
       |      array_sort(collect_list(CASE WHEN kept
       |        THEN struct(line_idx, line) END)),
       |      x -> x.line))) END AS surviving_fp
       |FROM _k GROUP BY $id""".stripMargin
  }

  /** SQL twin of q81's mixture balancing: every stratum downsampled to the
    * rarest one's size, deterministically. Stratum counts and thresholds
    * derive IN-PLAN (two tiny aggregations + a scalar subquery) instead of
    * q81's driver round-trip — same integer arithmetic
    * (`floor(n_min·10^6 / n_s)` via `div`), same shuffle-free hash-compare
    * keep decision, so rows are identical (spec-pinned). Output: all of
    * `table`'s columns for surviving rows. Needs `graft_hash60`.
    */
  def mixtureSampleSql(table: String, idCol: String, stratumCol: String): String = {
    val (id, st) = (bt(idCol), bt(stratumCol))
    s"""WITH _c AS (SELECT $st AS _s, count(*) AS _n FROM $table GROUP BY $st),
       |_m AS (SELECT min(_n) AS _n_min FROM _c),
       |_t AS (SELECT _s, (SELECT _n_min FROM _m) * 1000000L div _n AS _thr FROM _c)
       |SELECT t.* FROM $table t JOIN _t ON t.$st = _t._s
       |WHERE pmod(graft_hash60(cast(t.$id AS STRING)), 1000000L) < _t._thr""".stripMargin
  }
}
