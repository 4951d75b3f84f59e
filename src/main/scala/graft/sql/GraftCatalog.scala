package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Name → path catalog for versioned tables (i36) — the last spelling gap
  * with the reference, which addresses its Delta tables by NAME through
  * the metastore (`hive_metastore.silver.transactions`,
  * 4_silver/silver_transactions.py:21-52 CREATE DATABASE/TABLE) while
  * graft statements took path literals only.
  *
  * The catalog is a DIRECTORY of one tiny JSON file per table name (the
  * metastore re-expressed filesystem-native, like the commit log itself):
  * {{{
  *   <root>/silver.transactions.json   {"path": "/data/silver/transactions"}
  * }}}
  * so it shares whatever filesystem the tables live on — every cluster
  * node and session resolves the same names, and registration is atomic
  * per-name (two CREATEs of one name: one wins, one fails named — the
  * transactional-DDL contract a metastore gives). The claim primitive is
  * the commit log's own: hard-link create-if-exists-fails on POSIX,
  * HDFS-contract rename (destination-exists fails) elsewhere; only an
  * exotic mount with NEITHER primitive degrades to exists+rename, whose
  * narrow photo-finish window [[graft.sources.VersionedTable]]'s publish
  * documents — the same trade, accepted for the same reason.
  *
  * Root resolution: `spark.graft.catalog.dir` conf when set, else
  * `<spark.sql.warehouse.dir>/_graft_catalog` (the shared-warehouse
  * default — names are infrastructure, scoped like Hive's metastore, not
  * like temp views). Names are dotted identifiers (`db.table`), stored
  * one file per full name; no hierarchy is imposed beyond the spelling.
  *
  * DROP unregisters the NAME only — the table directory and its log are
  * untouched (external-table semantics: every graft table has an explicit
  * LOCATION; data lifecycle belongs to VACUUM, not DDL).
  */
object GraftCatalog {

  private val NameRe = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.catalog.dir").getOrElse {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      s"${wh.stripSuffix("/")}/_graft_catalog"
    }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def entryPath(spark: SparkSession, name: String): Path = {
    require(name.matches(NameRe),
      s"'$name' is not a valid table name (dotted identifiers only)")
    new Path(root(spark), s"$name.json")
  }

  /** Register `name` → `path`. Atomic create-if-absent: a second CREATE
    * of the same name fails named unless `ifNotExists` (then: no-op when
    * the existing registration points at the SAME path, named failure
    * when it points elsewhere — IF NOT EXISTS must never silently retarget
    * a name).
    */
  def register(spark: SparkSession, name: String, path: String,
      ifNotExists: Boolean = false): Unit = {
    val entry = entryPath(spark, name)
    val fs = fsOf(spark, entry)
    fs.mkdirs(entry.getParent)
    val body =
      s"""{"path": ${com.fasterxml.jackson.databind.node.TextNode.valueOf(path).toString}}"""
    // ATOMIC content + atomic claim (the commit-log publish discipline):
    // the body is fully written to an invisible temp, then linked/renamed
    // with a no-overwrite primitive — a concurrent resolve() can never
    // read a half-written entry, and a crash mid-register leaves only a
    // sweepable .tmp, never a permanently poisoned name
    val tmp = new Path(entry.getParent,
      s".${entry.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    def renamePublish(): Boolean =
      if (fs.exists(entry)) false else fs.rename(tmp, entry)
    val won =
      if (fs.getUri.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(entry.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException => renamePublish()
          case _: java.nio.file.FileSystemException if !fs.exists(entry) =>
            renamePublish()
          case _: java.io.IOException if fs.exists(entry) => false
        }
      } else renamePublish()
    try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
    if (!won) resolve(spark, name) match {
      case Some(existing) if ifNotExists && existing == path => ()
      case Some(existing) => sys.error(
        s"table name '$name' is already registered (-> $existing)" +
          (if (ifNotExists) s" and cannot be re-pointed at $path via IF NOT EXISTS — DROP it first"
           else " — DROP it first or use IF NOT EXISTS"))
      case None => sys.error(
        // a publish that failed with NO registration in place is an IO
        // problem, not a race — say so instead of masking the cause
        s"table name '$name': registration publish failed and no " +
          "concurrent registration is in place — not a race; check " +
          s"filesystem permissions/quota on ${root(spark)} and retry")
    }
  }

  /** The registered path for `name`, if any. */
  def resolve(spark: SparkSession, name: String): Option[String] = {
    val entry = entryPath(spark, name)
    val fs = fsOf(spark, entry)
    if (!fs.exists(entry)) None
    else {
      val in = fs.open(entry)
      val text =
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      Some(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(text).get("path").asText())
    }
  }

  /** Unregister `name`; fails named when absent (unless `ifExists`). */
  def drop(spark: SparkSession, name: String, ifExists: Boolean = false): Unit = {
    val entry = entryPath(spark, name)
    val fs = fsOf(spark, entry)
    if (!fs.delete(entry, false) && !ifExists)
      sys.error(s"no graft table named '$name' to drop")
  }

  /** All registrations as (name, path), name-ordered. */
  def list(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = new Path(root(spark))
    val fs = fsOf(spark, dir)
    val rows =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq
        .map(_.getPath.getName).filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).sorted
        .flatMap(n => resolve(spark, n).map(p => (n, p)))
    rows.toDF("name", "path")
  }
}
