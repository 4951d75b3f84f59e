package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit, when}

import VersionedTable.{AddFile, MetaPosCol, MetaRelCol}

/** Conditional MERGE (i34) — the full Delta MERGE clause semantics the
  * reference's centerpiece statements actually use
  * (4_silver/silver_transactions.py:124-176: `WHEN MATCHED AND (target.x
  * <> source.x OR …) THEN UPDATE SET is_current = false …` then a second
  * merge's `WHEN NOT MATCHED THEN INSERT`), where [[VersionedTable.merge]]
  * is the unconditional whole-row-upsert special case. Builder API shaped
  * like Delta's own `DeltaTable.merge`:
  *
  * {{{
  *   VersionedTable.mergeInto(spark, table, source,
  *       on = expr("t.id = s.id AND t.is_current = true"),
  *       targetAlias = "t", sourceAlias = "s")
  *     .whenMatchedUpdate(Map("is_current" -> lit(false)),
  *       condition = expr("t.v <> s.v"))
  *     .whenMatchedDelete(condition = expr("s.op = 'D'"))
  *     .whenNotMatchedInsert(Map("id" -> expr("s.id"), "v" -> expr("s.v")))
  *     .execute()
  * }}}
  *
  * Semantics (the public Delta contract):
  *  - clauses apply IN DECLARATION ORDER: the first clause whose
  *    condition holds (absent condition = always) takes the row; later
  *    clauses never see it;
  *  - a matched target row no clause claims passes through UNCHANGED —
  *    and a file none of whose matched rows take any action is untouched
  *    BYTES, not a pointless rewrite;
  *  - a target row MODIFIED by more than one source row fails named
  *    (Delta's multiple-match error: the update/delete would be
  *    ambiguous); join fan-out every clause leaves alone is legal — the
  *    row survives once — and insert-only merges tolerate fan-out
  *    (matches are simply not inserted);
  *  - WHEN NOT MATCHED conditions/values may reference only the source
  *    side (a target reference has no row to bind — fails analysis,
  *    named); unassigned insert columns land as typed NULLs;
  *  - NULL join keys never match (SQL join semantics): such target rows
  *    count as NOT MATCHED BY SOURCE (they survive untouched unless a
  *    BY SOURCE clause claims them), such source rows reach the insert
  *    clauses.
  *
  * Execution is the [[VersionedTable.merge]] copy-on-write discipline,
  * bounded at every stage:
  *  1. equi-conjuncts of `on` (`t.k = s.k`) are extracted from the
  *     ANALYZED condition and the source's per-key [min,max] prunes the
  *     live file list through the log's i25 stats — an SCD2 merge of one
  *     day's keys plans ~one day's files;
  *  2. a key-metadata semi-join over the survivors finds files holding
  *     matches; ONE checkpointed join (target rows × matched source rows,
  *     action + post-image columns precomputed) feeds the cardinality
  *     check, the survivor/update/delete split, the rewrite file list and
  *     the CDF images — never a per-clause rescan;
  *  3. only files where some row ACTS are rewritten: unchanged rows as
  *     `dataChange=false` survivors, updated rows + inserts as new
  *     `dataChange=true` files (CHECK-constraint enforced, i33).
  *
  * Commit protocol: op `merge` when the merge purely INSERTED;
  * `merge_update` when it rewrote rows; `merge_delete` when it deleted.
  * The append face ([[VersionedTable.readChangesSince]]) serves `merge`
  * and `merge_update` commits as exactly the staged batch (dataChange
  * adds only — an updated key flows downstream as a new row version,
  * never retracted: Delta's `ignoreChanges` contract), and fails NAMED
  * on `merge_delete` (rows vanished — reconsume or read the CDF face);
  * [[VersionedTable.readChangeFeed]] serves the full sidecar images for
  * all three. Conflict rule is merge's: decided against a
  * snapshot, any concurrent non-vacuum commit fails named. A merge where
  * no row acts commits NOTHING (no version, no feed breakage) and sweeps
  * whatever it materialized.
  */
final class MergeIntoBuilder private[sources] (
    spark: SparkSession, table: String, source: DataFrame, on: Column,
    targetAlias: String, sourceAlias: String) {

  import MergeIntoBuilder._

  private var matched = Vector.empty[MatchedClause]
  private var notMatched = Vector.empty[InsertClause]
  private var bySource = Vector.empty[MatchedClause]

  /** WHEN MATCHED [AND condition] THEN UPDATE SET … — `set` maps target
    * column name → expression over both aliases; unnamed columns keep
    * their target value.
    */
  def whenMatchedUpdate(set: Map[String, Column],
      condition: Column = null): this.type = {
    require(set.nonEmpty, "UPDATE SET needs at least one assignment")
    matched :+= MatchedClause(Option(condition), Some(set)); this
  }

  /** WHEN MATCHED [AND condition] THEN UPDATE SET * — every target column
    * takes the same-named source column (Delta's `updateAll`).
    */
  def whenMatchedUpdateAll(condition: Column = null): this.type = {
    matched :+= MatchedClause(Option(condition), None); this
  }

  /** WHEN MATCHED [AND condition] THEN DELETE. */
  def whenMatchedDelete(condition: Column = null): this.type = {
    matched :+= MatchedClause(Option(condition), Some(Map.empty)); this
  }

  /** WHEN NOT MATCHED BY SOURCE [AND condition] THEN UPDATE SET … —
    * target rows with NO source match (Delta's sync-to-source face, e.g.
    * "expire everything the feed stopped sending"). `set`/`condition`
    * should reference the target alias only; source columns evaluate as
    * NULL for these rows (there is no source row to bind).
    */
  def whenNotMatchedBySourceUpdate(set: Map[String, Column],
      condition: Column = null): this.type = {
    require(set.nonEmpty, "UPDATE SET needs at least one assignment")
    bySource :+= MatchedClause(Option(condition), Some(set)); this
  }

  /** WHEN NOT MATCHED BY SOURCE [AND condition] THEN DELETE. */
  def whenNotMatchedBySourceDelete(condition: Column = null): this.type = {
    bySource :+= MatchedClause(Option(condition), Some(Map.empty)); this
  }

  /** WHEN NOT MATCHED [AND condition] THEN INSERT (cols) VALUES (…) —
    * `values` maps target column name → source-side expression;
    * unassigned columns insert as typed NULLs.
    */
  def whenNotMatchedInsert(values: Map[String, Column],
      condition: Column = null): this.type = {
    require(values.nonEmpty, "INSERT needs at least one column")
    notMatched :+= InsertClause(Option(condition), Some(values)); this
  }

  /** WHEN NOT MATCHED [AND condition] THEN INSERT * — every target column
    * from the same-named source column (Delta's `insertAll`).
    */
  def whenNotMatchedInsertAll(condition: Column = null): this.type = {
    notMatched :+= InsertClause(Option(condition), None); this
  }

  def execute(): MergeMetrics = {
    val VT = VersionedTable
    require(matched.nonEmpty || notMatched.nonEmpty || bySource.nonEmpty,
      "MERGE needs at least one WHEN clause")
    val base = VT.snapshotAt(spark, table)
    val schema = base.schema
    val fields = schema.fieldNames.toSeq
    // resolve UPDATE SET * / INSERT * and validate explicit column names
    // up front, named — not at write-time alignment depth
    val srcCols = source.columns.toSet
    matched.foreach {
      case MatchedClause(_, Some(set)) if set.nonEmpty =>
        val bad = set.keys.filterNot(fields.contains)
        require(bad.isEmpty,
          s"MERGE UPDATE SET targets absent columns: ${bad.mkString(", ")}")
      case MatchedClause(_, None) =>
        val missing = fields.filterNot(srcCols.contains)
        require(missing.isEmpty,
          s"MERGE UPDATE SET * needs every table column on the source; " +
            s"missing: ${missing.mkString(", ")}")
      case _ => ()
    }
    bySource.foreach {
      case MatchedClause(_, Some(set)) if set.nonEmpty =>
        val bad = set.keys.filterNot(fields.contains)
        require(bad.isEmpty,
          s"MERGE NOT MATCHED BY SOURCE UPDATE SET targets absent columns: " +
            bad.mkString(", "))
      case _ => ()
    }
    notMatched.foreach {
      case InsertClause(_, Some(values)) =>
        val bad = values.keys.filterNot(fields.contains)
        require(bad.isEmpty,
          s"MERGE INSERT targets absent columns: ${bad.mkString(", ")}")
      case InsertClause(_, None) =>
        val missing = fields.filterNot(srcCols.contains)
        require(missing.isEmpty,
          s"MERGE INSERT * needs every table column on the source; " +
            s"missing: ${missing.mkString(", ")}")
    }
    def setOf(c: MatchedClause): Map[String, Column] = c.set match {
      case Some(s) => s
      case None => fields.map(f => f -> col(s"$sourceAlias.$f")).toMap
    }
    def valuesOf(c: InsertClause): Map[String, Column] = c.values match {
      case Some(v) => v
      case None => fields.map(f => f -> col(s"$sourceAlias.$f")).toMap
    }

    val src = source.localCheckpoint()
    try {
      // ---- stage 1: stats-prune candidates via the ON equi-conjuncts
      val equiPairs = extractEquiPairs(spark, schema, src.schema, on,
        targetAlias, sourceAlias)
      // LAZY: the aggregate job over the source only runs when a consumer
      // actually reads `candidates` — a matched+by-source-only merge
      // scans the whole target anyway and must not pay a wasted pass
      lazy val candidates: Seq[AddFile] =
        if (equiPairs.isEmpty) base.files
        else {
          import org.apache.spark.sql.functions.{max, min}
          val aggs = equiPairs.zipWithIndex.flatMap { case ((_, s), i) =>
            Seq(min(col(s)).as(s"__mn_$i"), max(col(s)).as(s"__mx_$i")) }
          val row = src.agg(aggs.head, aggs.tail: _*).collect()(0)
          val pruners = equiPairs.zipWithIndex.flatMap { case ((t, _), i) =>
            (VT.statCarrier(row.get(2 * i)), VT.statCarrier(row.get(2 * i + 1))) match {
              case (Some(mn), Some(mx)) =>
                Seq(VT.Pruner(t, "ge", Seq(mn)), VT.Pruner(t, "le", Seq(mx)))
              case _ => Nil
            }
          }
          base.files.filter(f => pruners.forall(c => VT.mayMatch(f, c)))
        }

      val orphans = new VT.OrphanTracker(spark, table)
      val out = orphans.guarded {
        // ---- stage 2: one checkpointed join over files holding matches
        val srcTagged = src.withColumn(MatchTag, lit(true)).alias(sourceAlias)
        // Files that may hold source MATCHES: equi-stats candidates
        // narrowed by one semi-join — the bounded discovery matched
        // clauses ride, also reused by the pruned by-source path below.
        lazy val matchHitFiles: Seq[AddFile] =
          if (candidates.isEmpty) Nil
          else {
            val keyScan = VT.scanFiles(spark, table, candidates, schema,
              keepMeta = true).alias(targetAlias)
            val hit = keyScan.join(src.alias(sourceAlias), on, "left_semi")
              .select(col(MetaRelCol)).distinct()
              .collect().map(_.getString(0)).toSet
            candidates.filter(f => hit.contains(f.path))
          }
        val hitFiles: Seq[AddFile] =
          if (bySource.nonEmpty) {
            // An UNCONDITIONAL NOT MATCHED BY SOURCE clause can act on ANY
            // unmatched target row, so it scans the whole table (the
            // Delta-documented cost of the sync-to-source shape). A clause
            // whose condition carries prunable TARGET-ONLY conjuncts
            // (partition bound, min/max range) can only act where they may
            // match, so files failing every clause's pruners hold no
            // actionable unmatched row and are skipped; files that may
            // hold source matches come back via the semi-join (their
            // matched rows run the WHEN MATCHED chain). r20/r21 verdict
            // ask #6, guide §6.
            val perClause: Seq[Seq[VT.Pruner]] = bySource.map(
              _.condition.fold(Seq.empty[VT.Pruner])(c =>
                VT.targetOnlyPruners(spark, base.schema, targetAlias, c)))
            if (perClause.exists(_.isEmpty)) base.files
            else {
              val byCond = base.files.filter(f =>
                perClause.exists(ps => ps.forall(p => VT.mayMatch(f, p))))
              val byCondPaths = byCond.map(_.path).toSet
              byCond ++ (if (matched.isEmpty) Nil
                         else matchHitFiles.filterNot(f => byCondPaths(f.path)))
            }
          }
          else if (matched.isEmpty) Nil
          else matchHitFiles
        MergeIntoBuilder.lastPlannedScan = hitFiles.size

        var nUpdated = 0L; var nDeleted = 0L
        var removeFiles = Seq.empty[AddFile]
        var survivorAdds = Seq.empty[AddFile]
        var changedAdds = Seq.empty[AddFile]
        var cdcFrames = Seq.empty[DataFrame]
        val marked: Option[DataFrame] =
          if (hitFiles.isEmpty) None
          else {
            val tScan = VT.scanFiles(spark, table, hitFiles, schema,
              keepMeta = true).alias(targetAlias)
            val joined = tScan.join(srcTagged, on, "left_outer")
            val isMatch = col(MatchTag).isNotNull
            // first-true-clause dispatch; unclaimed = Keep. Matched rows
            // run the WHEN MATCHED chain, unmatched rows the NOT MATCHED
            // BY SOURCE chain (source columns are NULL there — no row)
            val act = matched.zipWithIndex.reverse.foldLeft(lit(Keep)) {
              case (rest, (c, i)) =>
                when(c.condition.getOrElse(lit(true)), lit(actName(c, i)))
                  .otherwise(rest)
            }
            val actBySource = bySource.zipWithIndex.reverse.foldLeft(lit(Keep)) {
              case (rest, (c, i)) =>
                when(c.condition.getOrElse(lit(true)), lit(bySourceActName(c, i)))
                  .otherwise(rest)
            }
            // post-image values for every field, dispatched on the SAME
            // action column (computed BEFORE the checkpoint collapses the
            // aliases — duplicate names become unambiguous __gf_ columns)
            val updIdx = matched.zipWithIndex.filter(_._1.isUpdate)
              .map { case (c, i) => (c, actName(c, i)) } ++
              bySource.zipWithIndex.filter(_._1.isUpdate)
                .map { case (c, i) => (c, bySourceActName(c, i)) }
            val postCols = fields.map { f =>
              updIdx.reverse.foldLeft(col(s"$targetAlias.$f")) {
                case (rest, (c, a)) =>
                  when(col(ActCol) === a,
                    setOf(c).getOrElse(f, col(s"$targetAlias.$f"))).otherwise(rest)
              }.as(s"__gf_u_$f")
            }
            val proj = joined
              .withColumn(ActCol,
                when(isMatch, act).otherwise(actBySource))
              .select(Seq(col(s"$targetAlias.$MetaRelCol").as(MetaRelCol),
                col(s"$targetAlias.$MetaPosCol").as(MetaPosCol),
                col(ActCol)) ++
                fields.map(f => col(s"$targetAlias.$f").as(s"__gf_t_$f")) ++
                postCols: _*)
            Some(proj.localCheckpoint())
          }
        try {
          marked.foreach { m =>
            // Delta's multiple-match error — on rows multiple source rows
            // would actually MODIFY (update/delete), not on mere join
            // fan-out: a fanned-out row every clause leaves alone is legal
            // (nothing ambiguous is written). Delta's one further
            // exception holds too: a SINGLE UNCONDITIONAL DELETE clause
            // tolerates fan-out (deleting a row twice is the same delete
            // — nothing ambiguous), so a dedupe-free delete-merge that
            // runs on Delta runs here.
            // (bySource clauses are irrelevant here: unmatched target
            // rows join exactly once and can never fan out)
            val soleUnconditionalDelete = matched.size == 1 &&
              matched.head.isDelete && matched.head.condition.isEmpty
            if (!soleUnconditionalDelete) {
              val dup = m.filter(col(ActCol) =!= Keep)
                .groupBy(col(MetaRelCol), col(MetaPosCol)).count()
                .filter(col("count") > 1).limit(1).collect()
              require(dup.isEmpty,
                s"MERGE into $table: a target row is modified by multiple " +
                  s"source rows (${dup.headOption.map(_.toString).getOrElse("")}) — " +
                  "the update/delete is ambiguous; dedupe the source on the join keys")
            }
            // counts over DISTINCT physical rows: a fan-out-tolerated
            // delete must report each deleted row once
            val counts = m.filter(col(ActCol) =!= Keep)
              .select(col(ActCol), col(MetaRelCol), col(MetaPosCol)).distinct()
              .groupBy(col(ActCol)).count()
              .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
            val updActs = matched.zipWithIndex.filter(_._1.isUpdate)
              .map { case (c, i) => actName(c, i) } ++
              bySource.zipWithIndex.filter(_._1.isUpdate)
                .map { case (c, i) => bySourceActName(c, i) }
            val delActs = matched.zipWithIndex.filter(_._1.isDelete)
              .map { case (c, i) => actName(c, i) } ++
              bySource.zipWithIndex.filter(_._1.isDelete)
                .map { case (c, i) => bySourceActName(c, i) }
            nUpdated = updActs.map(counts.getOrElse(_, 0L)).sum
            nDeleted = delActs.map(counts.getOrElse(_, 0L)).sum
            if (nUpdated + nDeleted > 0) {
              // only files where some row ACTS rewrite; the rest stay bytes
              val rewrite = m.filter(col(ActCol) =!= Keep)
                .select(col(MetaRelCol)).distinct()
                .collect().map(_.getString(0)).toSet
              removeFiles = hitFiles.filter(f => rewrite.contains(f.path))
              import spark.implicits._
              val rewriteDf = removeFiles.map(_.path).toDF(MetaRelCol)
              val inRewrite = m.join(broadcast(rewriteDf), MetaRelCol)
              val tCols = fields.map(f => col(s"__gf_t_$f").as(f))
              val uCols = fields.map(f => col(s"__gf_u_$f").as(f))
              // survivors = target rows NO source row modified, ONCE each:
              // join fan-out duplicates keep-rows (dropDuplicates on the
              // physical row coordinate), and a row one match keeps but
              // another modifies belongs to the acting side only
              val actedRows = inRewrite.filter(col(ActCol) =!= Keep)
                .select(col(MetaRelCol), col(MetaPosCol)).distinct()
              val survivors = inRewrite.filter(col(ActCol) === Keep)
                .join(actedRows, Seq(MetaRelCol, MetaPosCol), "left_anti")
                .dropDuplicates(MetaRelCol, MetaPosCol)
                .select(tCols: _*)
              survivorAdds = orphans.track(
                VT.writeData(survivors, table, schema, base.partitionBy))
                .filter(_.rows > 0).map(_.copy(dataChange = false))
              if (nUpdated > 0) {
                val updatedRows = inRewrite
                  .filter(col(ActCol).isin(updActs: _*))
                  .dropDuplicates(MetaRelCol, MetaPosCol).select(uCols: _*)
                changedAdds = orphans.track(VT.writeDataEnforced(updatedRows,
                  table, schema, base.partitionBy, base.constraints))
                  .filter(_.rows > 0)
              }
              if (base.changeFeed) {
                // one image per PHYSICAL row (fan-out-tolerated deletes
                // would otherwise double their preimages)
                val acted = inRewrite.filter(col(ActCol) =!= Keep)
                  .dropDuplicates(MetaRelCol, MetaPosCol)
                if (nUpdated > 0) {
                  val pre = acted.filter(col(ActCol).isin(updActs: _*))
                  cdcFrames :+= pre.select(tCols: _*)
                    .withColumn(VT.ChangeTypeCol, lit("update_preimage"))
                  cdcFrames :+= pre.select(uCols: _*)
                    .withColumn(VT.ChangeTypeCol, lit("update_postimage"))
                }
                if (nDeleted > 0)
                  cdcFrames :+= acted.filter(col(ActCol).isin(delActs: _*))
                    .select(tCols: _*)
                    .withColumn(VT.ChangeTypeCol, lit("delete"))
              }
            }
          }

          // ---- inserts: source rows with no match anywhere in the table.
          // The anti-join runs over the CANDIDATE files only — stage-1
          // pruning is sound for matching (a match requires the equi
          // conjuncts, and the source's key range covers its own rows), so
          // a source row matching a pruned file cannot exist.
          var insertAdds = Seq.empty[AddFile]
          if (notMatched.nonEmpty) {
            val tAnti = VT.scanFiles(spark, table, candidates, schema)
              .alias(targetAlias)
            val anti = src.alias(sourceAlias).join(tAnti, on, "left_anti")
            val iact = notMatched.zipWithIndex.reverse
              .foldLeft(lit(null).cast("string")) { case (rest, (c, i)) =>
                when(c.condition.getOrElse(lit(true)), lit(s"i$i")).otherwise(rest)
              }
            val withAct = anti.withColumn(ActCol, iact)
              .filter(col(ActCol).isNotNull)
            val insRows = withAct.select(fields.map { f =>
              notMatched.zipWithIndex.reverse.foldLeft(
                lit(null).cast(schema(f).dataType)) { case (rest, (c, i)) =>
                when(col(ActCol) === s"i$i",
                  valuesOf(c).getOrElse(f, lit(null).cast(schema(f).dataType)))
                  .otherwise(rest)
              }.as(f)
            }: _*)
            insertAdds = orphans.track(VT.writeDataEnforced(insRows, table,
              schema, base.partitionBy, base.constraints)).filter(_.rows > 0)
            if (base.changeFeed && insertAdds.nonEmpty)
              cdcFrames :+= VT.scanFiles(spark, table, insertAdds, schema)
                .withColumn(VT.ChangeTypeCol, lit("insert"))
          }
          val nInserted = insertAdds.map(_.rows).sum

          if (nUpdated + nDeleted + nInserted == 0) {
            // nothing acted: commit NOTHING (no version, no feed breakage)
            orphans.sweep()
            MergeMetrics(base.version, committed = false, 0L, 0L, 0L)
          } else {
            val cdcAdds =
              if (!base.changeFeed || cdcFrames.isEmpty) Nil
              else orphans.trackCdc(VT.writeCdc(
                cdcFrames.reduce(_.unionByName(_)), table))
            // op records what the merge did: deletes break append-only
            // consumption (merge_delete fails the append feed named);
            // rewrites flow through it as the staged batch (merge_update);
            // a pure-insert merge commits plain 'merge'
            val op = if (nDeleted > 0) "merge_delete"
              else if (nUpdated > 0) "merge_update" else "merge"
            VersionedTable.testHookBeforeCommit()
            val v = VT.commitLoop(spark, table, op) {
              case None => sys.error(s"no versioned table at $table — create() it first")
              case Some(snap) =>
                VT.conflictGuard(spark, table, base.version, snap.version, "merge")
                Some(removeFiles.map(f => VT.removeLine(f.path)) ++
                  (survivorAdds ++ changedAdds ++ insertAdds).map(VT.addLine) ++
                  cdcAdds.map { case (p, r) => VT.cdcLine(p, r) })
            }.get
            MergeMetrics(v, committed = true, nUpdated, nDeleted, nInserted)
          }
        } finally { marked.foreach(_.unpersist()); () }
      }
      out
    } finally { src.unpersist(); () }
  }
}

object MergeIntoBuilder {
  private val MatchTag = "__gf_s_match"
  private val ActCol = "__gf_act"
  private val Keep = "keep"

  /** File count of the most recent merge's planned target scan on this
    * JVM — the test/observability hook the by-source stats-pruning spec
    * pins (the [[graft.ops.Graph.lastPageRankIters]] precedent); not
    * meaningful under concurrent merges.
    */
  @volatile private[graft] var lastPlannedScan: Int = -1

  private[sources] final case class MatchedClause(condition: Option[Column],
      set: Option[Map[String, Column]]) {
    def isDelete: Boolean = set.contains(Map.empty)
    def isUpdate: Boolean = !isDelete
  }
  private[sources] final case class InsertClause(condition: Option[Column],
      values: Option[Map[String, Column]])

  private def actName(c: MatchedClause, i: Int): String =
    if (c.isDelete) s"d$i" else s"u$i"

  private def bySourceActName(c: MatchedClause, i: Int): String =
    if (c.isDelete) s"sd$i" else s"su$i"

  /** MERGE metrics (Delta's operationMetrics shape): `version` is the
    * committed version, or the unchanged base version when `committed`
    * is false (the no-row-acted no-op — nothing was written to the log).
    */
  final case class MergeMetrics(version: Long, committed: Boolean,
      rowsUpdated: Long, rowsDeleted: Long, rowsInserted: Long)

  /** Equi-conjunct pairs (targetCol, sourceCol) of the ANALYZED `on` —
    * resolved against zero-row probes of both schemas so attribute
    * ownership is decided by expression id, never by name guessing.
    * Null-safe equality (`<=>`) is deliberately NOT extracted: it matches
    * null keys, which min/max stats cannot bound.
    */
  private def extractEquiPairs(spark: SparkSession,
      targetSchema: org.apache.spark.sql.types.StructType,
      sourceSchema: org.apache.spark.sql.types.StructType,
      on: Column, targetAlias: String, sourceAlias: String): Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.Row
    def empty(s: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
    val pt = empty(targetSchema).alias(targetAlias)
    val ps = empty(sourceSchema).alias(sourceAlias)
    val tIds = pt.queryExecution.analyzed.output.map(_.exprId).toSet
    val sIds = ps.queryExecution.analyzed.output.map(_.exprId).toSet
    val analyzed =
      try pt.join(ps, on, "inner").queryExecution.analyzed
      catch { case scala.util.control.NonFatal(_) => return Nil }
    val cond = analyzed.collectFirst { case j: Join => j.condition }.flatten
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    cond.toSeq.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, b: AttributeReference)
        if tIds.contains(a.exprId) && sIds.contains(b.exprId) =>
        Some((a.name, b.name))
      case EqualTo(a: AttributeReference, b: AttributeReference)
        if sIds.contains(a.exprId) && tIds.contains(b.exprId) =>
        Some((b.name, a.name))
      case _ => None
    }
  }
}
