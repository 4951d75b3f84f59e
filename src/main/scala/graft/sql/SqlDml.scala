package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.sources.VersionedTable

/** SQL spellings for the versioned-table WRITE path (r19) — the i11
  * discipline ("every operator SQL-spellable") extended past SELECTs to
  * the DML the reference runs as Delta SQL: `MERGE INTO`, `DELETE FROM`,
  * `UPDATE`, `OPTIMIZE … ZORDER BY`, `VACUUM`, `DESCRIBE HISTORY`,
  * `RESTORE`, and `VERSION/TIMESTAMP AS OF` time travel (reference:
  * 4_silver/silver_transactions.py:124,153 MERGE INTO;
  * 1_audit/audit_ddl.sql:27 USING DELTA).
  *
  * [[run]] is the single entry point: statements matching the grammar
  * below dispatch onto the [[VersionedTable]] commit protocol (same
  * semantics, same conflict rules, same log — spec-pinned lockstep with
  * the Scala API in SqlSurfaceSpec); anything else falls through to plain
  * `spark.sql`, so a notebook can feed it every statement it has.
  * Open-source Spark's parser has no transactional-table DML target to
  * hook these onto (the reference gets that from the Delta runtime), so
  * the dialect is interpreted here rather than injected into the parser —
  * the statement TEXT is Delta's public spelling.
  *
  * Grammar (keywords case-insensitive; `'<path>'` is the table directory
  * as a quoted string literal; predicates/expressions are Spark SQL
  * fragments, parsed by Spark itself via `expr`):
  * {{{
  *   MERGE INTO '<path>' USING <tempView> ON KEYS (k1[, k2…])
  *   DELETE FROM '<path>' WHERE <pred> [USING DELETION VECTORS]
  *   UPDATE '<path>' SET c1 = <e1>[, c2 = <e2>…] WHERE <pred>
  *   OPTIMIZE '<path>' [ZORDER BY (a, b)]
  *   VACUUM '<path>' [RETAIN <n> VERSIONS]
  *   DESCRIBE HISTORY '<path>'
  *   RESTORE TABLE '<path>' TO VERSION AS OF <v>
  *   TABLE '<path>' [VERSION AS OF <v> | TIMESTAMP AS OF <millis>]
  *   ALTER TABLE '<path>' ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TABLE '<path>' DROP CONSTRAINT <name>
  * }}}
  *
  * DML statements return a one-row metrics frame (Delta's convention):
  * the committed version plus affected-row counts; `TABLE`/`DESCRIBE`
  * return their data. `USING DELETION VECTORS` picks the i30
  * merge-on-read delete; without it, DELETE is copy-on-write.
  */
object SqlDml {

  private val MergeRe =
    """(?is)\s*MERGE\s+INTO\s+'([^']+)'\s+USING\s+(\S+)\s+ON\s+KEYS\s*\(([^)]+)\)\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)(\s+USING\s+DELETION\s+VECTORS)?\s*""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s*""".r
  private val DvSuffixRe =
    """(?is)^(.*?)(\s+USING\s+DELETION\s+VECTORS)?\s*$""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+'([^']+)'(\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+'([^']+)'(\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*""".r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+TABLE\s+'([^']+)'\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r
  private val TableVersionRe =
    """(?is)\s*TABLE\s+'([^']+)'\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r
  private val TableTimestampRe =
    """(?is)\s*TABLE\s+'([^']+)'\s+TIMESTAMP\s+AS\s+OF\s+(\d+)\s*""".r
  private val TableRe =
    """(?is)\s*TABLE\s+'([^']+)'\s*""".r
  private val AddConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*""".r
  private val DropConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*""".r

  private def metrics(spark: SparkSession, names: Seq[String],
      values: Seq[Long]): DataFrame = {
    import spark.implicits._
    Seq(values).toDF().selectExpr(
      values.indices.map(i => s"value[$i] AS `${names(i)}`"): _*)
  }

  /** First TOP-LEVEL, token-bounded occurrence of keyword `kw` — outside
    * string literals and parens; -1 when absent. A regex split would
    * backtrack to the LAST occurrence and mis-parse a predicate whose
    * string literal contains the keyword.
    */
  private[sql] def topLevelKeyword(s: String, kw: String): Int = {
    val upper = s.toUpperCase(java.util.Locale.ROOT)
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) {
        // Spark's default literals accept backslash escapes: \' must not
        // toggle the string state (or the REAL closing quote re-opens it
        // and a genuine top-level keyword scans as in-string)
        if (ch == '\\') i += 1
        else if (ch == '\'') inStr = false
      }
      else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          // '_' is a WORD character in SQL identifiers: tax_where_applied
          // must not split at its embedded 'where'
          def word(c: Char) = c == '_' || Character.isLetterOrDigit(c)
          if (depth == 0 && upper.startsWith(kw, i) &&
              (i == 0 || !word(s.charAt(i - 1))) &&
              (i + kw.length >= s.length || !word(s.charAt(i + kw.length))))
            return i
      }
      i += 1
    }
    -1
  }

  /** Split a SET clause on top-level commas (commas inside parens or
    * string literals belong to the expressions).
    */
  private[sql] def splitSet(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) {
        if (ch == '\\') i += 1 // escaped char (incl. \') stays in-string
        else if (ch == '\'') inStr = false
      }
      else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def run(spark: SparkSession, stmt: String): DataFrame = stmt match {
    case MergeRe(path, view, keyList) =>
      val keys = keyList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val staged = spark.table(view)
      // count BEFORE the commit: a view defined over the merge target
      // would otherwise report the post-merge state, not the batch
      val nStaged = staged.count()
      val v = VersionedTable.merge(staged, path, keys)
      metrics(spark, Seq("version", "rows_staged"), Seq(v, nStaged))
    case DeleteRe(path, pred, dv) =>
      val result =
        if (dv != null) VersionedTable.deleteVectors(spark, path, expr(pred))
        else VersionedTable.delete(spark, path, expr(pred))
      val (v, n) = result.getOrElse(
        (VersionedTable.latestVersion(spark, path), 0L))
      metrics(spark, Seq("version", "rows_deleted"), Seq(v, n))
    case UpdateRe(path, tail) =>
      val wi = topLevelKeyword(tail, "WHERE")
      require(wi > 0, s"UPDATE needs a top-level WHERE clause: $stmt")
      val setClause = tail.substring(0, wi).trim
      val (pred, dv) = tail.substring(wi + "WHERE".length) match {
        case DvSuffixRe(p, suffix) => (p.trim, suffix != null)
      }
      val set = splitSet(setClause).map { kv =>
        val eq = kv.indexOf('=')
        require(eq > 0, s"malformed SET assignment: $kv")
        kv.substring(0, eq).trim.stripPrefix("`").stripSuffix("`") ->
          expr(kv.substring(eq + 1).trim)
      }.toMap
      val result =
        if (dv) VersionedTable.updateVectors(spark, path, expr(pred), set)
        else VersionedTable.update(spark, path, expr(pred), set)
      val (v, n) = result
        .getOrElse((VersionedTable.latestVersion(spark, path), 0L))
      metrics(spark, Seq("version", "rows_updated"), Seq(v, n))
    case OptimizeRe(path, z, za, zb) =>
      val v = VersionedTable.optimize(spark, path,
        zorderBy = if (z == null) None else Some((za, zb)))
      metrics(spark, Seq("version", "compacted"),
        Seq(v.getOrElse(VersionedTable.latestVersion(spark, path)),
          if (v.isDefined) 1L else 0L))
    case VacuumRe(path, r, n) =>
      val deleted = VersionedTable.vacuum(spark, path,
        retainVersions = if (r == null) 2 else n.toInt)
      metrics(spark, Seq("files_deleted"), Seq(deleted.toLong))
    case HistoryRe(path) =>
      VersionedTable.history(spark, path)
    case AddConstraintRe(path, name, check) =>
      val v = VersionedTable.addConstraint(spark, path, name, check)
      metrics(spark, Seq("version"), Seq(v))
    case DropConstraintRe(path, name) =>
      val v = VersionedTable.dropConstraint(spark, path, name)
      metrics(spark, Seq("version"), Seq(v))
    case RestoreRe(path, v) =>
      val nv = VersionedTable.restore(spark, path, v.toLong)
      metrics(spark, Seq("version", "restored_to"), Seq(nv, v.toLong))
    case TableVersionRe(path, v) =>
      VersionedTable.readVersion(spark, path, v.toLong)
    case TableTimestampRe(path, ts) =>
      VersionedTable.readTimestamp(spark, path, ts.toLong)
    case TableRe(path) =>
      VersionedTable.read(spark, path)
    case other =>
      spark.sql(other)
  }
}
