package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Versioned table with a transaction log (i23): the commit protocol the
  * reference leans on everywhere it says `USING DELTA` — its gold layer
  * (5_gold/fact_transaction.py:49 and every dim_ / fact_ sibling) and its
  * audit log (1_audit/audit_start.py:2 "audit.audit_logs (Delta)") are
  * versioned tables, while i09's directory-swap overwrite can only model
  * the full-refresh case. This is the log-structured re-expression: a
  * table is a directory of immutable parquet data files plus an append-only
  * `_graft_log/` of numbered JSON commits, and EVERY reader plans from the
  * log, never from a directory listing.
  *
  * Log layout (all driver-side metadata-rate; one small JSON file per
  * commit):
  * {{{
  *   <table>/_graft_log/00000000000000000000.json   commit 0
  *   <table>/_graft_log/00000000000000000010.checkpoint.json
  *   <table>/data/<commit-uuid>/part-*.parquet      immutable data files
  * }}}
  * A commit file is JSON Lines — `meta` (schema), `add {path, rows}`,
  * `remove {path}`, `txn {app, batch}`, `vacuum {horizon}` actions — and
  * MUST end with a terminal `commit {op}` marker line: a torn half-written
  * commit file fails every subsequent read NAMED (manual recovery, the
  * honest answer on a filesystem without atomic single-file publish)
  * instead of serving a half-applied transaction. An `overwrite` commit is
  * encoded uniformly as `remove` of every previously-live file plus the
  * new `add`s, so snapshot replay is one fold over actions.
  *
  * Concurrency is optimistic, exactly like the public Delta protocol on
  * HDFS: a writer computes its snapshot, writes its DATA files first
  * (invisible until referenced), then publishes version N via a
  * put-if-absent of `N.json` (temp write + hard-link/no-overwrite-rename
  * — see [[tryPublish]]) whose mutual exclusion is the filesystem's own. A
  * loser re-reads the log and retries at N+1; blind appends and full
  * overwrites commute, so retry needs no conflict analysis beyond the
  * `txn` re-check that makes streaming idempotent ([[txnAppend]]: an
  * (app, batch) pair already in the log commits nothing — the
  * foreachBatch replay contract, s34).
  *
  * Scale: the log IS the file listing — a snapshot read of a 100 TB /
  * 10⁶-file table costs one log replay (driver, metadata-rate) instead of
  * an object-store LIST storm, and time travel is replay-to-V. Replay
  * cost is bounded by [[checkpointInterval]]: writers roll a full-state
  * `.checkpoint.json` every N commits and readers start from the latest
  * checkpoint ≤ target, so steady-state planning reads ≤ N commit files
  * regardless of table age. [[vacuum]] deletes data files no retained
  * version references and records the horizon in the log; a time travel
  * below the horizon fails NAMED rather than half-reading.
  */
object VersionedTable {

  val LogDirName = "_graft_log"
  val DataDirName = "data"

  /** Commits between full-state checkpoints (writers roll one when
    * `version % checkpointInterval == 0`).
    */
  val checkpointInterval = 10

  private val MaxCommitAttempts = 20

  private val mapper = new ObjectMapper()

  final case class AddFile(path: String, rows: Long)

  /** The replayed log state as of one version. `txns` holds the highest
    * committed batch per streaming app (batch ids are monotonic per app —
    * the Structured Streaming contract s34 rides).
    */
  final case class Snapshot(version: Long, schemaJson: String,
      files: Seq[AddFile], txns: Map[String, Long], vacuumHorizon: Long) {
    def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  // ---------------------------------------------------------------- paths

  private def logDir(table: String) = new Path(table, LogDirName)

  private def commitPath(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.json")

  private def checkpointPath(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.checkpoint.json")

  private def fsOf(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitVersions(fs: FileSystem, table: String): Seq[Long] =
    listLog(fs, table)._1

  /** (commit versions asc, checkpoint versions asc). */
  private def listLog(fs: FileSystem, table: String): (Seq[Long], Seq[Long]) = {
    val dir = logDir(table)
    if (!fs.exists(dir)) return (Nil, Nil)
    val names = fs.listStatus(dir).map(_.getPath.getName)
    val commits = names.collect { case n if n.matches("\\d{20}\\.json") =>
      n.stripSuffix(".json").toLong }.sorted.toSeq
    val checkpoints = names.collect { case n if n.matches("\\d{20}\\.checkpoint\\.json") =>
      n.stripSuffix(".checkpoint.json").toLong }.sorted.toSeq
    (commits, checkpoints)
  }

  def exists(spark: SparkSession, table: String): Boolean =
    commitVersions(fsOf(spark, table), table).nonEmpty

  /** Latest committed version; fails named on a non-table path. */
  def latestVersion(spark: SparkSession, table: String): Long = {
    val vs = commitVersions(fsOf(spark, table), table)
    require(vs.nonEmpty, s"no versioned table at $table — create() it first")
    vs.last
  }

  // ------------------------------------------------------------ commit IO

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Put-if-absent publish with ATOMIC content visibility: the body is
    * fully written to a temp file in the log dir, then linked/renamed to
    * the final name with a genuinely no-overwrite primitive. Content
    * appears atomically (a reader can never see a half-written commit
    * file — create-then-write in place would expose one, and a crash
    * mid-write would brick the table as a permanent torn commit), and
    * mutual exclusion is the filesystem's own:
    *  - local/POSIX: `Files.createLink(dst, tmp)` — hard-link creation is
    *    an atomic fail-if-exists syscall (rename(2) REPLACES, so two
    *    photo-finish writers would both think they won);
    *  - HDFS-like: `rename(tmp, dst)` — the HDFS contract fails when the
    *    destination exists, atomically.
    * A crash before the publish leaves an invisible `.tmp` straggler
    * ([[vacuum]] sweeps stale temps). False = lost; retry at the next
    * version.
    */
  private def tryPublish(fs: FileSystem, p: Path, body: String, token: String): Boolean = {
    val tmp = new Path(p.getParent, s".${p.getName}.$token.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // HDFS-shaped publish: the contract says rename FAILS (false) when the
    // destination exists. An EXCEPTION leaves the outcome ambiguous —
    // disambiguate by the writer token (a rename that succeeded before
    // throwing must never be retried as a double commit); if even the
    // confirmation read fails, FAIL NAMED rather than guess either way
    // (assuming "lost" would double-commit, assuming "won" would drop).
    def renamePublish(): Boolean =
      try { if (fs.exists(p)) false else fs.rename(tmp, p) }
      catch {
        case e: java.io.IOException =>
          try fs.exists(p) && readText(fs, p).contains(token)
          catch {
            case e2: java.io.IOException => sys.error(
              s"commit publish outcome UNCONFIRMABLE at $p (${e.getMessage}; " +
                s"confirmation read: ${e2.getMessage}) — refusing to guess: " +
                "retrying could double-commit, abandoning could drop")
          }
      }
    val won =
      if (fs.getUri.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(p.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // a file:// mount without hard links (FAT/FUSE/network): fall
          // back to exists+rename — the pre-link protocol, with its
          // (narrow) photo-finish window, beats crashing every commit
          case _: UnsupportedOperationException => renamePublish()
          case _: java.nio.file.FileSystemException if !fs.exists(p) => renamePublish()
          case _: java.io.IOException if fs.exists(p) => false
        }
      } else renamePublish()
    // the local-FS link leaves tmp behind by design; sweep it either way
    try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
    won
  }

  private def obj(kind: String)(fill: com.fasterxml.jackson.databind.node.ObjectNode => Unit): String = {
    val root = mapper.createObjectNode()
    fill(root.putObject(kind))
    mapper.writeValueAsString(root)
  }

  private def addLine(f: AddFile) =
    obj("add") { n => n.put("path", f.path); n.put("rows", f.rows) }
  private def removeLine(path: String) = obj("remove")(_.put("path", path))
  private def metaLine(schemaJson: String) = obj("meta")(_.put("schema", schemaJson))
  private def txnLine(app: String, batch: Long) =
    obj("txn") { n => n.put("app", app); n.put("batch", batch) }
  private def vacuumLine(horizon: Long) = obj("vacuum")(_.put("horizon", horizon))
  private def commitLine(op: String, token: String) =
    obj("commit") { n => n.put("op", op); n.put("writer", token) }

  /** Parse one commit file's actions; a file without the terminal commit
    * marker is a torn write and fails NAMED — serving a half-applied
    * transaction would be silent corruption.
    */
  private def parseCommit(fs: FileSystem, table: String, v: Long): (Seq[JsonNode], String) = {
    val text = readText(fs, commitPath(table, v))
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val nodes = try lines.map(mapper.readTree) catch {
      case e: Exception => sys.error(
        s"versioned table $table: commit $v is unparseable (${e.getMessage}) — " +
          "torn commit file; manual recovery required")
    }
    val op = nodes.lastOption.flatMap(n => Option(n.get("commit")))
      .map(_.get("op").asText())
      .getOrElse(sys.error(
        s"versioned table $table: commit $v lacks its terminal commit marker — " +
          "torn commit file; manual recovery required"))
    (nodes, op)
  }

  private def applyActions(s: Snapshot, nodes: Seq[JsonNode], v: Long): Snapshot = {
    var schemaJson = s.schemaJson
    var files = s.files
    var txns = s.txns
    var horizon = s.vacuumHorizon
    nodes.foreach { n =>
      if (n.has("meta")) schemaJson = n.get("meta").get("schema").asText()
      else if (n.has("add")) {
        val a = n.get("add")
        files = files :+ AddFile(a.get("path").asText(), a.get("rows").asLong())
      } else if (n.has("remove")) {
        val path = n.get("remove").get("path").asText()
        files = files.filterNot(_.path == path)
      } else if (n.has("txn")) {
        val t = n.get("txn")
        val app = t.get("app").asText()
        val batch = t.get("batch").asLong()
        txns = txns.updated(app, math.max(batch, txns.getOrElse(app, Long.MinValue)))
      } else if (n.has("vacuum"))
        // MAX, not last-writer-wins: two concurrent vacuums with different
        // retention both commit; the larger horizon already DELETED files,
        // so letting the smaller one regress the record would re-open
        // time travel onto missing data
        horizon = math.max(horizon, n.get("vacuum").get("horizon").asLong())
    }
    Snapshot(v, schemaJson, files, txns, horizon)
  }

  private def writeCheckpoint(fs: FileSystem, table: String, s: Snapshot): Unit = {
    val root = mapper.createObjectNode()
    root.put("version", s.version)
    root.put("schema", s.schemaJson)
    root.put("horizon", s.vacuumHorizon)
    val fa = root.putArray("files")
    s.files.foreach { f =>
      val n = fa.addObject(); n.put("path", f.path); n.put("rows", f.rows) }
    val ta = root.putObject("txns")
    s.txns.foreach { case (app, b) => ta.put(app, b) }
    // checkpoints are derived state: last-writer-wins is safe (every
    // writer of version V derives the identical snapshot) — but content
    // must appear ATOMICALLY (temp + rename; a reader listing the log
    // mid-write must never parse a half-written checkpoint). On a
    // no-overwrite filesystem the delete+rename leaves a window with no
    // checkpoint at V, which readers handle by design (they fall back to
    // an earlier checkpoint or full replay).
    val dst = checkpointPath(table, s.version)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) fs.delete(tmp, false)
  }

  /** [[readCheckpoint]] tolerating the no-overwrite refresh window (the
    * checkpoint is briefly absent between delete and rename): None means
    * "use an older checkpoint or replay", never a crash.
    */
  private def readCheckpointOpt(fs: FileSystem, table: String, v: Long): Option[Snapshot] =
    try Some(readCheckpoint(fs, table, v))
    catch { case _: java.io.IOException => None }

  private def readCheckpoint(fs: FileSystem, table: String, v: Long): Snapshot = {
    val n = mapper.readTree(readText(fs, checkpointPath(table, v)))
    val files = {
      val it = n.get("files").elements()
      val buf = Seq.newBuilder[AddFile]
      while (it.hasNext) { val f = it.next()
        buf += AddFile(f.get("path").asText(), f.get("rows").asLong()) }
      buf.result()
    }
    val txns = {
      val it = n.get("txns").fields()
      val buf = Map.newBuilder[String, Long]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue.asLong()) }
      buf.result()
    }
    Snapshot(n.get("version").asLong(), n.get("schema").asText(), files, txns,
      n.get("horizon").asLong())
  }

  /** Replay the log to `version` (latest when negative). Starts from the
    * newest checkpoint ≤ target so planning cost is bounded by
    * [[checkpointInterval]], not table age.
    */
  def snapshotAt(spark: SparkSession, table: String, version: Long = -1L): Snapshot = {
    val fs = fsOf(spark, table)
    val (commits, checkpoints) = listLog(fs, table)
    require(commits.nonEmpty, s"no versioned table at $table — create() it first")
    val target = if (version < 0) commits.last else version
    require(commits.contains(target),
      s"versioned table $table has no version $target (versions ${commits.head}..${commits.last})")
    // newest parseable checkpoint ≤ target; an unreadable one (a reader
    // racing the delete+rename refresh window on a no-overwrite
    // filesystem) falls back to the next-older checkpoint, then to full
    // replay — never a crash on the transient case
    var s = checkpoints.filter(_ <= target).sorted.reverseIterator
      .map(v => readCheckpointOpt(fs, table, v))
      .collectFirst { case Some(snap) => snap }
      .getOrElse(Snapshot(-1L, null, Nil, Map.empty, 0L))
    // the fallback must not SILENTLY serve a partial table: replay is only
    // valid when every commit in (base, target] survives (pre-checkpoint
    // commits may legitimately be pruned — but then a readable checkpoint
    // must cover them, and losing both is a named failure, not quiet loss)
    val commitSet = commits.toSet
    val missing = ((s.version + 1) to target).filterNot(commitSet.contains)
    require(missing.isEmpty,
      s"versioned table $table: cannot reconstruct version $target — commits " +
        s"${missing.take(5).mkString(", ")}${if (missing.size > 5) ", …" else ""} " +
        "are pruned and no readable checkpoint covers them")
    commits.filter(v => v > s.version && v <= target).foreach { v =>
      val (nodes, _) = parseCommit(fs, table, v)
      s = applyActions(s, nodes, v)
    }
    // the binding horizon is the CURRENT one — a vacuum logged AFTER the
    // target version has already deleted the target's unreferenced files,
    // and replay-to-target cannot see it. Horizons only grow and every
    // checkpoint carries the horizon as of its version, so only the tail
    // commits past the LATEST checkpoint need parsing — time travel stays
    // bounded by checkpointInterval, not table age.
    val horizon = if (target == commits.last) s.vacuumHorizon else {
      val cpLater = checkpoints.filter(_ > target).lastOption
        .flatMap(v => readCheckpointOpt(fs, table, v).map(c => (v, c.vacuumHorizon)))
      var h = math.max(s.vacuumHorizon, cpLater.map(_._2).getOrElse(0L))
      val from = math.max(target, cpLater.map(_._1).getOrElse(Long.MinValue))
      commits.filter(_ > from).foreach { v =>
        parseCommit(fs, table, v)._1.foreach { n =>
          if (n.has("vacuum"))
            h = math.max(h, n.get("vacuum").get("horizon").asLong())
        }
      }
      h
    }
    require(target >= horizon,
      s"versioned table $table: version $target was vacuumed (horizon $horizon) — " +
        "its data files are gone; time travel only reaches retained versions")
    s
  }

  private def readFiles(spark: SparkSession, table: String, s: Snapshot): DataFrame = {
    val schema = s.schema
    if (s.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema).parquet(s.files.map(f => s"$table/${f.path}"): _*)
  }

  /** The latest snapshot as a DataFrame — the plan reads ONLY files the
    * log references (never a directory listing).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    readFiles(spark, table, snapshotAt(spark, table))

  /** Time travel: the table exactly as of `version`. */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame =
    readFiles(spark, table, snapshotAt(spark, table, version))

  // -------------------------------------------------------------- writes

  /** Write `df`'s rows as immutable parquet under `data/<uuid>/` and
    * return their log entries. Data files are INVISIBLE until a commit
    * references them — a crash here leaves garbage vacuum sweeps, never a
    * half-applied table.
    */
  private def writeData(df: DataFrame, table: String, schema: StructType): Seq[AddFile] = {
    val aligned = align(df, schema)
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val rel = s"$DataDirName/files-$uuid"
    aligned.write.parquet(s"$table/$rel")
    val fs = fsOf(df.sparkSession, table)
    val parts = fs.listStatus(new Path(s"$table/$rel"))
      .filter(_.getPath.getName.endsWith(".parquet")).sortBy(_.getPath.getName)
    // per-file row counts from the parquet FOOTERS — metadata-rate (the
    // row-group headers the read path opens anyway), never a second pass
    // over the data
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    parts.toSeq.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p.getPath, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val rows = try r.getRecordCount finally r.close()
      AddFile(s"$rel/${p.getPath.getName}", rows)
    }
  }

  /** Schema enforcement (the Delta contract the reference relies on —
    * gold notebooks never re-declare their table): same column SET, same
    * types, any order; a drifted frame fails NAMED, never silently casts.
    */
  private def align(df: DataFrame, schema: StructType): DataFrame = {
    val want = schema.fields.map(f => f.name -> f.dataType).toMap
    val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
    require(got.keySet == want.keySet,
      s"schema drift: table columns ${want.keySet.toSeq.sorted.mkString(", ")} vs " +
        s"frame columns ${got.keySet.toSeq.sorted.mkString(", ")} — missing " +
        s"${(want.keySet -- got.keySet).toSeq.sorted.mkString(", ")}; unexpected " +
        s"${(got.keySet -- want.keySet).toSeq.sorted.mkString(", ")}")
    val drifted = want.keys.filter(k => got(k) != want(k)).toSeq.sorted
    require(drifted.isEmpty,
      s"schema drift: columns ${drifted.mkString(", ")} changed type " +
        s"(${drifted.map(k => s"$k: ${want(k).simpleString} -> ${got(k).simpleString}").mkString("; ")})")
    df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  /** The optimistic-concurrency commit loop: re-snapshot, build actions,
    * publish exclusively, retry on loss. `actions` may return None to
    * abandon the commit (the txn-already-committed case).
    */
  private def commitLoop(spark: SparkSession, table: String, op: String)(
      actions: Option[Snapshot] => Option[Seq[String]]): Option[Long] = {
    val fs = fsOf(spark, table)
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val vs = commitVersions(fs, table)
      val snap = if (vs.isEmpty) None else Some(snapshotAt(spark, table))
      actions(snap) match {
        case None => return None
        case Some(lines) =>
          val v = snap.map(_.version + 1).getOrElse(0L)
          val token = java.util.UUID.randomUUID().toString
          val body = (lines :+ commitLine(op, token)).mkString("", "\n", "\n")
          if (tryPublish(fs, commitPath(table, v), body, token)) {
            // the commit is durably published from here; the checkpoint is
            // DERIVED, last-writer-wins state — a failure writing it (a
            // concurrent vacuum racing the horizon past v, transient IO)
            // must never surface as a failed commit, or a plain append()
            // caller would retry and double-append (only txnAppend is
            // idempotent). A later writer at the next interval re-covers
            // replay bounding.
            if (v > 0 && v % checkpointInterval == 0)
              try writeCheckpoint(fs, table, snapshotAt(spark, table, v))
              catch { case scala.util.control.NonFatal(_) => () }
            return Some(v)
          }
      }
      attempt += 1
    }
    sys.error(s"versioned table $table: lost the commit race $MaxCommitAttempts times — " +
      "a writer storm needs external coordination")
  }

  /** Create the table at version 0; fails named if it already exists. */
  def create(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    require(!exists(spark, table),
      s"versioned table $table already exists — append() or overwrite() it")
    val schema = df.schema
    val adds = writeData(df, table, schema)
    commitLoop(spark, table, "create") {
      case Some(_) => sys.error(
        s"versioned table $table was created concurrently — append() or overwrite() it")
      case None => Some(metaLine(schema.json) +: adds.map(addLine))
    }.get
  }

  /** Append `df` (schema-enforced) as one commit; returns the version. */
  def append(df: DataFrame, table: String): Long =
    txnAppend(df, table, app = null, batch = 0L).get

  /** [[append]] under SCHEMA EVOLUTION — the public Delta `mergeSchema`
    * contract the reference's silver tables lean on when a source adds a
    * column: NEW columns WIDEN the table schema in this same commit (a
    * `meta` action), columns the frame omits land as typed NULLs, and a
    * type CHANGE on a shared column still fails named. Widening never
    * rewrites history: older files simply read the new columns as null,
    * and time travel below the widening commit serves the old schema.
    */
  def appendEvolve(df: DataFrame, table: String): Long =
    txnAppend(df, table, app = null, batch = 0L, evolve = true).get

  /** Merge `incoming`'s columns into `base`: additions append, shared
    * columns must keep their type (named failure), nothing is removed.
    */
  private def evolvedSchema(base: StructType, incoming: StructType): StructType = {
    val baseTypes = base.fields.map(f => f.name -> f.dataType).toMap
    val retyped = incoming.fields.filter(f =>
      baseTypes.get(f.name).exists(_ != f.dataType))
    require(retyped.isEmpty,
      s"schema drift: columns ${retyped.map(_.name).mkString(", ")} changed type " +
        s"(${retyped.map(f => s"${f.name}: ${baseTypes(f.name).simpleString} -> ${f.dataType.simpleString}").mkString("; ")}) — " +
        "evolution ADDS columns, it never retypes")
    StructType(base.fields ++ incoming.fields.filterNot(f => baseTypes.contains(f.name)))
  }

  /** Idempotent append: a (app, batch) pair already in the log commits
    * NOTHING and returns None — the exactly-once contract a Structured
    * Streaming foreachBatch replay needs (s34). Batch ids must be
    * monotonic per app (the streaming engine's own guarantee). With
    * `evolve` the append follows [[appendEvolve]]'s widening contract.
    */
  def txnAppend(df: DataFrame, table: String, app: String, batch: Long,
      evolve: Boolean = false): Option[Long] = {
    val spark = df.sparkSession
    val baseSchema = snapshotAt(spark, table).schema
    val writeSchema =
      if (evolve) evolvedSchema(baseSchema, df.schema) else baseSchema
    val prepared = if (evolve) {
      val have = df.columns.toSet
      df.select(writeSchema.fields.map(f =>
        if (have(f.name)) org.apache.spark.sql.functions.col(f.name)
        else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    } else df
    lazy val adds = writeData(prepared, table, writeSchema)
    var wrote = false
    val out = commitLoop(spark, table, "append") {
      case None => sys.error(s"no versioned table at $table — create() it first")
      case Some(snap) =>
        if (app != null && snap.txns.get(app).exists(_ >= batch)) None
        else {
          wrote = true
          val txn = if (app == null) Nil else Seq(txnLine(app, batch))
          // on a retry after losing the race, merge any CONCURRENT
          // widening into ours — the commit's meta must never narrow
          val meta = if (!evolve) Nil else {
            val merged = evolvedSchema(snap.schema, writeSchema)
            if (merged == snap.schema) Nil else Seq(metaLine(merged.json))
          }
          Some(meta ++ txn ++ adds.map(addLine))
        }
    }
    // a replay that lost the race to its own earlier commit: sweep the
    // orphaned (never-referenced) data files rather than waiting for vacuum
    if (out.isEmpty && wrote) {
      val fs = fsOf(spark, table)
      adds.map(_.path.split("/")(1)).distinct.foreach { d =>
        fs.delete(new Path(s"$table/$DataDirName/$d"), true) }
    }
    out
  }

  /** Full refresh as one commit: remove every live file, add the new ones.
    * Readers of older versions keep working (their files still exist until
    * [[vacuum]]).
    */
  def overwrite(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val schema = snapshotAt(spark, table).schema
    val adds = writeData(df, table, schema)
    commitLoop(spark, table, "overwrite") {
      case None => sys.error(s"no versioned table at $table — create() it first")
      case Some(snap) =>
        Some(snap.files.map(f => removeLine(f.path)) ++ adds.map(addLine))
    }.get
  }

  // ------------------------------------------------------------- history

  /** One row per commit: (version, op, n_adds, n_removes, txn_app,
    * txn_batch) — the observability face (Delta's DESCRIBE HISTORY).
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    val fs = fsOf(spark, table)
    val vs = commitVersions(fs, table)
    require(vs.nonEmpty, s"no versioned table at $table — create() it first")
    val rows = vs.map { v =>
      val (nodes, op) = parseCommit(fs, table, v)
      val txn = nodes.find(_.has("txn")).map(_.get("txn"))
      (v, op,
        nodes.count(_.has("add")), nodes.count(_.has("remove")),
        txn.map(_.get("app").asText()).orNull,
        txn.map(t => java.lang.Long.valueOf(t.get("batch").asLong())).orNull)
    }
    import spark.implicits._
    rows.toDF("version", "op", "n_adds", "n_removes", "txn_app", "txn_batch")
  }

  /** The change feed: rows APPENDED after `sinceVersion` (exclusive), read
    * from exactly the files those commits added — the q13/q62 incremental
    * contract without a watermark column. An intervening overwrite breaks
    * the append delta and fails NAMED (a full refresh means reconsume, and
    * pretending otherwise double-counts).
    */
  def readChangesSince(spark: SparkSession, table: String, sinceVersion: Long): DataFrame = {
    val fs = fsOf(spark, table)
    val vs = commitVersions(fs, table)
    require(vs.nonEmpty, s"no versioned table at $table — create() it first")
    require(vs.contains(sinceVersion),
      s"versioned table $table has no version $sinceVersion to read changes since")
    val later = vs.filter(_ > sinceVersion)
    val adds = later.flatMap { v =>
      val (nodes, op) = parseCommit(fs, table, v)
      if (op == "overwrite") sys.error(
        s"versioned table $table: commit $v is a full overwrite — the append " +
          s"delta since $sinceVersion is gone; reconsume from the new snapshot")
      nodes.filter(_.has("add"))
        .map(n => n.get("add").get("path").asText())
    }
    val schema = snapshotAt(spark, table).schema
    if (adds.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(adds.map(p => s"$table/$p"): _*)
  }

  // -------------------------------------------------------------- vacuum

  /** Delete data files referenced by NO retained version (the last
    * `retainVersions` snapshots stay time-travelable) plus any straggler
    * a crashed writer left, then return the number of files deleted.
    *
    * Two safety rails, both load-bearing:
    *  - the new horizon is LOGGED FIRST, files deleted after — a crash in
    *    between leaves extra files (harmless; the next vacuum sweeps),
    *    never a readable-per-the-log version with missing files;
    *  - only unreferenced files OLDER than `graceMs` die (the public
    *    Delta retention discipline): a concurrent writer's just-written
    *    data files are unreferenced BY DESIGN until its commit publishes,
    *    and a grace-less vacuum would delete them out from under it.
    *    The default (24 h) assumes no append takes a day; tests pass 0.
    */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int = 2,
      graceMs: Long = 24L * 3600 * 1000): Int = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    require(graceMs >= 0, s"graceMs must be non-negative, got $graceMs")
    val fs = fsOf(spark, table)
    val latest = latestVersion(spark, table)
    val prior = snapshotAt(spark, table).vacuumHorizon
    val horizon = math.max(prior, math.max(0L, latest - retainVersions + 1))
    // horizon first: from here, a below-horizon time travel fails NAMED
    // even if this process dies before deleting a single file
    commitLoop(spark, table, "vacuum")(_ => Some(Seq(vacuumLine(horizon))))
    val referenced = (horizon to latestVersion(spark, table))
      .flatMap(v => snapshotAt(spark, table, v).files.map(_.path)).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val dataRoot = new Path(s"$table/$DataDirName")
    var deleted = 0
    if (fs.exists(dataRoot)) {
      val it = fs.listFiles(dataRoot, true)
      val doomed = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next()
        val rel = s"$DataDirName/${f.getPath.getParent.getName}/${f.getPath.getName}"
        if (!referenced.contains(rel) && f.getModificationTime <= cutoff)
          doomed += f.getPath
      }
      doomed.result().foreach { f => if (fs.delete(f, false)) deleted += 1 }
      // sweep now-empty commit dirs
      fs.listStatus(dataRoot).foreach { d =>
        if (d.isDirectory && fs.listStatus(d.getPath).isEmpty)
          fs.delete(d.getPath, false)
      }
    }
    // crashed publishers' temp stragglers in the log dir, same grace
    fs.listStatus(logDir(table)).foreach { st =>
      if (st.getPath.getName.endsWith(".tmp") && st.getModificationTime <= cutoff)
        fs.delete(st.getPath, false)
    }
    deleted
  }
}
