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
}
