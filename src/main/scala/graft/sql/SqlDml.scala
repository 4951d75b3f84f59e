package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.sources.VersionedTable

/** SQL spellings for the versioned-table WRITE path (r19, widened r20) —
  * the i11 discipline ("every operator SQL-spellable") extended past
  * SELECTs to the DML the reference runs as Delta SQL: full-grammar
  * `MERGE INTO` with conditional clauses, `DELETE FROM`, `UPDATE`,
  * `OPTIMIZE … ZORDER BY`, `VACUUM`, `DESCRIBE HISTORY`, `RESTORE`,
  * `VERSION/TIMESTAMP AS OF` time travel, and name-catalog DDL
  * (reference: 4_silver/silver_transactions.py:124-176 MERGE INTO with
  * WHEN MATCHED AND …; :21-52 CREATE DATABASE/TABLE;
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
  * Grammar (keywords case-insensitive; `<target>` is either a quoted
  * path literal `'<dir>'` or a [[GraftCatalog]] table name; predicates /
  * expressions are Spark SQL fragments, parsed by Spark itself via
  * `expr`):
  * {{{
  *   MERGE INTO <target> [AS] t USING <tempView> [AS] s ON <cond>
  *     WHEN MATCHED [AND <cond>] THEN UPDATE SET c1 = <e1>[, …] | UPDATE SET * | DELETE
  *     WHEN NOT MATCHED [AND <cond>] THEN INSERT (c1, …) VALUES (<e1>, …) | INSERT *
  *     WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET … | DELETE
  *   MERGE INTO <target> USING <tempView> ON KEYS (k1[, k2…])   -- unconditional upsert
  *   DELETE FROM <target> WHERE <pred> [USING DELETION VECTORS]
  *   UPDATE <target> SET c1 = <e1>[, c2 = <e2>…] WHERE <pred> [USING DELETION VECTORS]
  *   OPTIMIZE <target> [ZORDER BY (a, b)]
  *   VACUUM <target> [RETAIN <n> VERSIONS | RETAIN <n> HOURS]
  *   DESCRIBE HISTORY <target>
  *   DESCRIBE DETAIL <target>
  *   CONVERT TO GRAFT '<dir>'
  *   RESTORE TABLE <target> TO VERSION AS OF <v>
  *   TABLE <target> [VERSION AS OF <v> | TIMESTAMP AS OF <millis>]
  *   ALTER TABLE <target> ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TABLE <target> DROP CONSTRAINT <name>
  *   CREATE TABLE [IF NOT EXISTS] <name> [(<colName type, …>)] USING graft
  *     [PARTITIONED BY (c1, …)] [LOCATION '<dir>']
  *   DROP TABLE [IF EXISTS] <name>
  *   SHOW TABLES
  * }}}
  *
  * DML statements return a one-row metrics frame (Delta's convention):
  * the committed version plus affected-row counts; `TABLE`/`DESCRIBE`/
  * `SHOW` return their data. `USING DELETION VECTORS` picks the i30
  * merge-on-read face; without it, DELETE/UPDATE are copy-on-write.
  * `VACUUM … RETAIN n HOURS` is Delta's public retention spelling: every
  * version committed within the last n hours stays time-travelable (plus
  * the state live at the cutoff), and the file grace window is n hours.
  * A `TABLE <name>` whose name is not in the graft catalog falls through
  * to `spark.sql` (temp views keep working); graft-only statements on an
  * unregistered name fail named.
  */
object SqlDml {

  // <target> = quoted path literal or catalog name
  private val Tgt = """('[^']+'|[A-Za-z_][\w.]*)"""

  private val MergeKeysRe =
    ("""(?is)\s*MERGE\s+INTO\s+""" + Tgt +
      """\s+USING\s+(\S+)\s+ON\s+KEYS\s*\(([^)]+)\)\s*""").r
  private val MergeHeadRe =
    ("""(?is)\s*MERGE\s+INTO\s+""" + Tgt +
      """\s+(?:(?:AS\s+)?(?!USING\b)([A-Za-z_]\w*)\s+)?USING\s+([A-Za-z_][\w.]*)""" +
      """\s+(?:(?:AS\s+)?(?!ON\b)([A-Za-z_]\w*)\s+)?ON\s+(.+)""").r
  private val MergeAnyRe = """(?is)\s*MERGE\s+INTO\s+.*""".r
  private val DeleteRe =
    ("""(?is)\s*DELETE\s+FROM\s+""" + Tgt + """\s+WHERE\s+(.+)""").r
  private val UpdateRe =
    ("""(?is)\s*UPDATE\s+""" + Tgt + """\s+SET\s+(.+)""").r
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+""" + Tgt +
      """(\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?\s*""").r
  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+""" + Tgt +
      """(\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?\s*""").r
  private val HistoryRe =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + Tgt + """\s*""").r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Tgt +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""").r
  private val TableVersionRe =
    ("""(?is)\s*TABLE\s+""" + Tgt + """\s+VERSION\s+AS\s+OF\s+(\d+)\s*""").r
  private val TableTimestampRe =
    ("""(?is)\s*TABLE\s+""" + Tgt + """\s+TIMESTAMP\s+AS\s+OF\s+(\d+)\s*""").r
  private val TableRe =
    ("""(?is)\s*TABLE\s+""" + Tgt + """\s*""").r
  private val AddConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*""").r
  private val DropConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+DROP\s+CONSTRAINT\s+(\w+)\s*""").r
  private val CreateTableRe =
    ("""(?is)\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*""" +
      """(?:\((.*)\)\s*)?USING\s+graft""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*""").r
  private val ConvertRe =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'\s*""".r
  private val DetailRe =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + Tgt + """\s*""").r
  private val DropTableRe =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*""".r
  private val ShowTablesRe = """(?is)\s*SHOW\s+TABLES\s*""".r

  /** Quoted path → literal; bare identifier → catalog lookup, named
    * failure when unregistered (these statements are graft-only — there
    * is nothing to fall through to).
    */
  private def pathOf(spark: SparkSession, token: String): String =
    if (token.startsWith("'")) token.stripPrefix("'").stripSuffix("'")
    else GraftCatalog.resolve(spark, token).getOrElse(sys.error(
      s"no graft table named '$token' — register it with " +
        "CREATE TABLE … USING graft LOCATION '<dir>'"))

  private def metrics(spark: SparkSession, names: Seq[String],
      values: Seq[Long]): DataFrame = {
    import spark.implicits._
    Seq(values).toDF().selectExpr(
      values.indices.map(i => s"value[$i] AS `${names(i)}`"): _*)
  }

  /** First TOP-LEVEL, token-bounded occurrence of keyword `kw` at or
    * after `from` — outside string literals (single- AND double-quoted:
    * Spark's default dialect takes both spellings), parens, and
    * `CASE … END` expressions (whose embedded WHEN/THEN would otherwise
    * split a MERGE clause mid-CASE); -1 when absent. The scan always
    * starts at 0 so the string/paren/CASE state at `from` is correct. A
    * regex split would backtrack to the LAST occurrence and mis-parse a
    * predicate whose string literal contains the keyword.
    */
  private[sql] def topLevelKeyword(s: String, kw: String, from: Int = 0): Int = {
    val upper = s.toUpperCase(java.util.Locale.ROOT)
    var depth = 0
    var caseDepth = 0
    var quote = '\u0000' // the open string delimiter, NUL = not in string
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote != '\u0000') {
        // Spark's default literals accept backslash escapes: \' must not
        // toggle the string state (or the REAL closing quote re-opens it
        // and a genuine top-level keyword scans as in-string)
        if (ch == '\\') i += 1
        else if (ch == quote) quote = '\u0000'
      }
      else ch match {
        case '\'' | '"' => quote = ch
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          // '_' is a WORD character in SQL identifiers: tax_where_applied
          // must not split at its embedded 'where'
          def word(c: Char) = c == '_' || Character.isLetterOrDigit(c)
          def tokenAt(t: String): Boolean =
            upper.startsWith(t, i) && (i == 0 || !word(s.charAt(i - 1))) &&
              (i + t.length >= s.length || !word(s.charAt(i + t.length)))
          if (tokenAt("CASE")) caseDepth += 1
          else if (caseDepth > 0 && tokenAt("END")) caseDepth -= 1
          else if (i >= from && depth == 0 && caseDepth == 0 && tokenAt(kw))
            return i
      }
      i += 1
    }
    -1
  }

  /** Split a SET clause / column list / VALUES list on top-level commas
    * (commas inside parens or string literals belong to the expressions).
    */
  private[sql] def splitSet(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var quote = '\u0000'
    var start = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote != '\u0000') {
        if (ch == '\\') i += 1 // escaped char (incl. \') stays in-string
        else if (ch == quote) quote = '\u0000'
      }
      else ch match {
        case '\'' | '"' => quote = ch
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

  /** Strip the trailing `USING DELETION VECTORS` from a predicate, if
    * present — via the same string/paren-aware scanner as every other
    * keyword (r19 verdict: one discipline, not a per-statement regex). A
    * top-level USING followed by anything else is malformed, named.
    */
  private[sql] def splitDvSuffix(pred: String): (String, Boolean) = {
    val i = topLevelKeyword(pred, "USING")
    if (i < 0) (pred.trim, false)
    else {
      val tail = pred.substring(i + "USING".length)
      require(tail.matches("""(?is)\s+DELETION\s+VECTORS\s*"""),
        s"malformed suffix after top-level USING: '${tail.trim}' " +
          "(expected DELETION VECTORS)")
      (pred.substring(0, i).trim, true)
    }
  }

  /** SET assignments text → (column → expression); LHS may carry the
    * target alias (None = no alias in scope, plain UPDATE) or backticks.
    */
  private def parseAssignments(setClause: String, targetAlias: Option[String])
      : Map[String, Column] =
    splitSet(setClause).map { kv =>
      val eq = kv.indexOf('=')
      require(eq > 0, s"malformed SET assignment: $kv")
      val lhs = kv.substring(0, eq).trim
        .stripPrefix("`").stripSuffix("`")
      val stripped = targetAlias match {
        case Some(a) if lhs.toLowerCase.startsWith(a.toLowerCase + ".") =>
          lhs.substring(a.length + 1)
        case _ => lhs
      }
      stripped.stripPrefix("`").stripSuffix("`") -> expr(kv.substring(eq + 1).trim)
    }.toMap

  // ------------------------------------------- Delta MERGE grammar (i34)

  private val ClauseHeadRe =
    """(?is)\s*(NOT\s+)?MATCHED(?:\s+BY\s+(SOURCE|TARGET))?(?:\s+AND\s+(.+?))?\s*""".r
  private val UpdateAllRe = """(?is)\s*UPDATE\s+SET\s+\*\s*""".r
  private val UpdateSetRe = """(?is)\s*UPDATE\s+SET\s+(.+)""".r
  private val DeleteActRe = """(?is)\s*DELETE\s*""".r
  private val InsertAllRe = """(?is)\s*INSERT\s+\*\s*""".r
  private val InsertRe =
    """(?is)\s*INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*""".r

  private def runDeltaMerge(spark: SparkSession, stmt: String): DataFrame = {
    val (tgtTok, tAliasOpt, view, sAliasOpt, tail) = stmt match {
      case MergeHeadRe(t, ta, v, sa, rest) => (t, Option(ta), v, Option(sa), rest)
      case _ => sys.error(
        s"malformed MERGE INTO (expected: MERGE INTO <target> [AS] t USING " +
          s"<view> [AS] s ON <cond> WHEN …): $stmt")
    }
    val tAlias = tAliasOpt.getOrElse("target")
    val sAlias = sAliasOpt.getOrElse("source")
    val firstWhen = topLevelKeyword(tail, "WHEN")
    require(firstWhen > 0, s"MERGE needs at least one WHEN clause: $stmt")
    val onCond = tail.substring(0, firstWhen).trim
    // split the clause list on successive top-level WHENs
    val whenStarts = Iterator.iterate(firstWhen)(i =>
      topLevelKeyword(tail, "WHEN", i + 4)).takeWhile(_ >= 0).toSeq
    val clauseTexts = whenStarts.zipAll(whenStarts.drop(1), -1, tail.length)
      .map { case (a, b) => tail.substring(a + "WHEN".length, b) }

    val path = pathOf(spark, tgtTok)
    val source = spark.table(view)
    var b = VersionedTable.mergeInto(spark, path, source, expr(onCond),
      tAlias, sAlias)
    clauseTexts.foreach { c =>
      val thenIdx = topLevelKeyword(c, "THEN")
      require(thenIdx > 0, s"MERGE clause needs THEN: WHEN $c")
      val (isNot, byTok, cond) = c.substring(0, thenIdx) match {
        case ClauseHeadRe(not, by, andCond) =>
          (not != null, Option(by).map(_.toUpperCase(java.util.Locale.ROOT)),
            Option(andCond).map(s => expr(s.trim)).orNull)
        case other => sys.error(s"malformed MERGE clause head: WHEN $other")
      }
      require(isNot || byTok.isEmpty,
        s"BY ${byTok.getOrElse("")} is only valid after NOT MATCHED: WHEN $c")
      val bySrc = isNot && byTok.contains("SOURCE")
      val action = c.substring(thenIdx + "THEN".length)
      (isNot, bySrc, action) match {
        case (false, _, UpdateAllRe()) => b = b.whenMatchedUpdateAll(cond)
        case (false, _, UpdateSetRe(assigns)) =>
          b = b.whenMatchedUpdate(parseAssignments(assigns, Some(tAlias)), cond)
        case (false, _, DeleteActRe()) => b = b.whenMatchedDelete(cond)
        case (true, true, UpdateSetRe(assigns)) =>
          b = b.whenNotMatchedBySourceUpdate(
            parseAssignments(assigns, Some(tAlias)), cond)
        case (true, true, DeleteActRe()) => b = b.whenNotMatchedBySourceDelete(cond)
        case (true, false, InsertAllRe()) => b = b.whenNotMatchedInsertAll(cond)
        case (true, false, InsertRe(cols, vals)) =>
          val names = splitSet(cols).map(_.stripPrefix("`").stripSuffix("`"))
          val exprs = splitSet(vals)
          require(names.length == exprs.length,
            s"INSERT column/value count mismatch (${names.length} vs " +
              s"${exprs.length}): WHEN $c")
          b = b.whenNotMatchedInsert(
            names.zip(exprs.map(e => expr(e))).toMap, cond)
        case (false, _, other) => sys.error(
          s"WHEN MATCHED supports UPDATE SET …/UPDATE SET */DELETE, got: ${other.trim}")
        case (true, true, other) => sys.error(
          s"WHEN NOT MATCHED BY SOURCE supports UPDATE SET …/DELETE, got: ${other.trim}")
        case (true, false, other) => sys.error(
          s"WHEN NOT MATCHED supports INSERT (…) VALUES (…)/INSERT *, got: ${other.trim}")
      }
    }
    val r = b.execute()
    metrics(spark, Seq("version", "rows_updated", "rows_deleted", "rows_inserted"),
      Seq(r.version, r.rowsUpdated, r.rowsDeleted, r.rowsInserted))
  }

  // -------------------------------------------------------------- entry

  def run(spark: SparkSession, stmt: String): DataFrame = stmt match {
    case MergeKeysRe(tgt, view, keyList) =>
      val path = pathOf(spark, tgt)
      val keys = keyList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val staged = spark.table(view)
      // count BEFORE the commit: a view defined over the merge target
      // would otherwise report the post-merge state, not the batch
      val nStaged = staged.count()
      val v = VersionedTable.merge(staged, path, keys)
      metrics(spark, Seq("version", "rows_staged"), Seq(v, nStaged))
    case m if MergeAnyRe.pattern.matcher(m).matches() =>
      runDeltaMerge(spark, m)
    case DeleteRe(tgt, predAndSuffix) =>
      val path = pathOf(spark, tgt)
      val (pred, dv) = splitDvSuffix(predAndSuffix)
      val result =
        if (dv) VersionedTable.deleteVectors(spark, path, expr(pred))
        else VersionedTable.delete(spark, path, expr(pred))
      val (v, n) = result.getOrElse(
        (VersionedTable.latestVersion(spark, path), 0L))
      metrics(spark, Seq("version", "rows_deleted"), Seq(v, n))
    case UpdateRe(tgt, tail) =>
      val path = pathOf(spark, tgt)
      val wi = topLevelKeyword(tail, "WHERE")
      require(wi > 0, s"UPDATE needs a top-level WHERE clause: $stmt")
      val setClause = tail.substring(0, wi).trim
      val (pred, dv) = splitDvSuffix(tail.substring(wi + "WHERE".length))
      val set = parseAssignments(setClause, targetAlias = None)
      val result =
        if (dv) VersionedTable.updateVectors(spark, path, expr(pred), set)
        else VersionedTable.update(spark, path, expr(pred), set)
      val (v, n) = result
        .getOrElse((VersionedTable.latestVersion(spark, path), 0L))
      metrics(spark, Seq("version", "rows_updated"), Seq(v, n))
    case OptimizeRe(tgt, z, za, zb) =>
      val path = pathOf(spark, tgt)
      val v = VersionedTable.optimize(spark, path,
        zorderBy = if (z == null) None else Some((za, zb)))
      metrics(spark, Seq("version", "compacted"),
        Seq(v.getOrElse(VersionedTable.latestVersion(spark, path)),
          if (v.isDefined) 1L else 0L))
    case VacuumRe(tgt, r, n, unit) =>
      val path = pathOf(spark, tgt)
      val deleted =
        if (r == null) VersionedTable.vacuum(spark, path)
        else if (unit.equalsIgnoreCase("VERSIONS"))
          VersionedTable.vacuum(spark, path, retainVersions = n.toInt)
        else {
          // Delta's public spelling: keep every version committed within
          // the last n hours time-travelable (plus the state live AT the
          // cutoff), and files younger than n hours safe from the sweep
          val graceMs = n.toLong * 3600L * 1000L
          val cutoff = System.currentTimeMillis() - graceMs
          val latest = VersionedTable.latestVersion(spark, path)
          val atCutoff =
            try VersionedTable.versionAtTimestamp(spark, path, cutoff)
            catch { case e: RuntimeException
              if e.getMessage != null && e.getMessage.contains("no commit at or before") =>
              0L } // table younger than the window: retain everything
          VersionedTable.vacuum(spark, path,
            retainVersions = (latest - atCutoff + 1).toInt, graceMs = graceMs)
        }
      metrics(spark, Seq("files_deleted"), Seq(deleted.toLong))
    case HistoryRe(tgt) =>
      VersionedTable.history(spark, pathOf(spark, tgt))
    case ConvertRe(path) =>
      val v = VersionedTable.convert(spark, path)
      metrics(spark, Seq("version"), Seq(v))
    case DetailRe(tgt) =>
      VersionedTable.detail(spark, pathOf(spark, tgt))
    case AddConstraintRe(tgt, name, check) =>
      val v = VersionedTable.addConstraint(spark, pathOf(spark, tgt), name, check)
      metrics(spark, Seq("version"), Seq(v))
    case DropConstraintRe(tgt, name) =>
      val v = VersionedTable.dropConstraint(spark, pathOf(spark, tgt), name)
      metrics(spark, Seq("version"), Seq(v))
    case RestoreRe(tgt, v) =>
      val path = pathOf(spark, tgt)
      val nv = VersionedTable.restore(spark, path, v.toLong)
      metrics(spark, Seq("version", "restored_to"), Seq(nv, v.toLong))
    case TableVersionRe(tgt, v) if resolvable(spark, tgt) =>
      VersionedTable.readVersion(spark, pathOf(spark, tgt), v.toLong)
    case TableTimestampRe(tgt, ts) if resolvable(spark, tgt) =>
      VersionedTable.readTimestamp(spark, pathOf(spark, tgt), ts.toLong)
    case TableRe(tgt) if resolvable(spark, tgt) =>
      VersionedTable.read(spark, pathOf(spark, tgt))
    case CreateTableRe(ifNot, name, colDefs, partBy, location) =>
      runCreateTable(spark, ifNot != null, name, Option(colDefs),
        Option(partBy), Option(location))
    case DropTableRe(_, name)
        if GraftCatalog.resolve(spark, name).isDefined =>
      // REGISTERED names unregister here; anything else — including
      // DROP TABLE IF EXISTS on a Spark-managed/temp table — falls
      // through to spark.sql, which owns those drops
      GraftCatalog.drop(spark, name)
      metrics(spark, Seq("dropped"), Seq(1L))
    case ShowTablesRe() =>
      GraftCatalog.list(spark)
    case other =>
      spark.sql(other)
  }

  /** TABLE statements keep temp views working: a bare name not in the
    * catalog falls through to `spark.sql` instead of failing.
    */
  private def resolvable(spark: SparkSession, tgt: String): Boolean =
    tgt.startsWith("'") || GraftCatalog.resolve(spark, tgt).isDefined

  /** CREATE TABLE … USING graft (i36): registers `name` → location in the
    * catalog; when no versioned table exists at the location yet and a
    * column list is given, creates it EMPTY at version 0 with that schema
    * (the reference's CREATE TABLE IF NOT EXISTS … USING DELTA shape,
    * silver_transactions.py:21-52). Registering an EXISTING table
    * validates the declared columns against its schema, named.
    * Managed default location: `<warehouse>/graft/<name>`.
    */
  private def runCreateTable(spark: SparkSession, ifNotExists: Boolean,
      name: String, colDefs: Option[String], partBy: Option[String],
      location: Option[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val path = location.getOrElse {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      s"${wh.stripSuffix("/")}/graft/$name"
    }
    val declared = colDefs.map(d => StructType.fromDDL(d))
    if (!VersionedTable.exists(spark, path)) {
      val schema = declared.getOrElse(sys.error(
        s"CREATE TABLE $name: no versioned table at $path and no column " +
          "list to create one — declare (col type, …) or point LOCATION " +
          "at an existing table"))
      val parts = partBy.map(splitSet(_).map(_.trim)).getOrElse(Nil)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      VersionedTable.create(empty, path, partitionBy = parts)
    } else declared.foreach { d =>
      val have = VersionedTable.snapshotAt(spark, path).schema
        .fields.map(f => f.name -> f.dataType).toMap
      val drift = d.fields.filter(f => !have.get(f.name).contains(f.dataType))
      require(drift.isEmpty,
        s"CREATE TABLE $name: declared columns " +
          s"${drift.map(_.name).mkString(", ")} do not match the existing " +
          s"table at $path — fix the declaration or drop the column list")
    }
    GraftCatalog.register(spark, name, path, ifNotExists)
    metrics(spark, Seq("version"),
      Seq(VersionedTable.latestVersion(spark, path)))
  }
}
