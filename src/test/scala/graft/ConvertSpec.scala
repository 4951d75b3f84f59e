package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** i39: CONVERT-in-place — an existing plain-parquet directory becomes a
  * versioned table without rewriting a byte — plus DESCRIBE DETAIL, the
  * migration and observability faces of "switch to this library".
  */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("convert: in-place import serves the original rows, stats-prunes, " +
      "takes DML on top, and vacuum retires rewritten imports at the root") {
    val dir = Files.createTempDirectory("cv_basic").resolve("t").toString
    // a plain parquet table written by vanilla Spark, two disjoint files
    (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1).write.parquet(dir)
    (21L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val want = spark.read.parquet(dir).collect().map(_.toSeq).toSet

    val v0 = VersionedTable.convert(spark, dir)
    assert(v0 == 0L)
    assert(VersionedTable.read(spark, dir).collect().map(_.toSeq).toSet == want)
    // footer stats came along: a point predicate prunes to one file
    val all = VersionedTable.snapshotAt(spark, dir).files.size
    assert(all == 2)
    assert(VersionedTable.survivingFiles(spark, dir, col("id") === 5L).size == 1)
    // history shows the convert op; a second convert fails named
    assert(VersionedTable.history(spark, dir).head().getString(1) == "convert")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.convert(spark, dir) }
    assert(e.getMessage.contains("already a versioned table"), e.getMessage)

    // DML on top: append flows the feed; a COW delete rewrites the hit
    // import; vacuum (root sweep) retires the physical file it replaced
    VersionedTable.append(Seq((41L, "x")).toDF("id", "v"), dir)
    assert(VersionedTable.readChangesSince(spark, dir, 0L).count() == 1L)
    val imported = VersionedTable.snapshotAt(spark, dir, 0L).files.map(_.path)
    VersionedTable.delete(spark, dir, col("id") === 5L)
    assert(VersionedTable.read(spark, dir).count() == 40L)
    VersionedTable.vacuum(spark, dir, retainVersions = 1, graceMs = 0L)
    val gone = imported.filterNot(p => fs.exists(new Path(s"$dir/$p")))
    assert(gone.size == 1,
      s"exactly the rewritten import retires; gone=$gone")
    assert(VersionedTable.read(spark, dir).count() == 40L, "reads intact")
  }

  test("convert fails NAMED on hive-partitioned layouts and empty dirs; " +
      "schema drift across files merges (missing columns read as NULL)") {
    val dir = Files.createTempDirectory("cv_bad").toFile.getAbsolutePath
    // hive-partitioned: partition values live in paths, not files
    val hive = s"$dir/hive"
    (1L to 10L).map(i => (i, s"v$i", i % 2)).toDF("id", "v", "p")
      .write.partitionBy("p").parquet(hive)
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.convert(spark, hive) }
    assert(e1.getMessage.contains("hive-partitioned"), e1.getMessage)
    // empty dir
    val empty = s"$dir/empty"
    fs.mkdirs(new Path(empty))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.convert(spark, empty) }
    assert(e2.getMessage.contains("no parquet files"), e2.getMessage)
    // drifted schemas: second file adds a column — merged, NULL-backfilled
    val drift = s"$dir/drift"
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(drift)
    Seq((2L, "b", 9.0)).toDF("id", "v", "amt").coalesce(1)
      .write.mode("append").parquet(drift)
    VersionedTable.convert(spark, drift)
    val got = VersionedTable.read(spark, drift)
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", Some(9.0))), got)
  }

  test("hidden-path rule: parquet under '_'/'.' directories is neither " +
      "imported nor vacuum-swept; nested layouts and '='-in-filename " +
      "convert fine; a FILE target fails named (third-review findings)") {
    val dir = Files.createTempDirectory("cv_hidden").resolve("t").toString
    // root data + NESTED subdir data (mixed depth - no directory
    // discovery involved, so this must convert) + a file whose NAME has
    // '=' (not a hive layout) + parquet under a hidden dir (a former
    // Delta table's _delta_log checkpoint - the exact migration shape)
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(dir)
    Seq((2L, "b")).toDF("id", "v").coalesce(1).write.parquet(s"$dir/archive")
    val eqFile = new Path(s"$dir/region=eu.parquet")
    Seq((3L, "c")).toDF("id", "v").coalesce(1).write.parquet(s"$dir/_tmp_eq")
    val part = fs.listStatus(new Path(s"$dir/_tmp_eq"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, eqFile)
    fs.delete(new Path(s"$dir/_tmp_eq"), true)
    fs.delete(new Path(s"$dir/.crc"), true)
    fs.mkdirs(new Path(s"$dir/_delta_log"))
    Seq((99L, 100L)).toDF("txn", "action").coalesce(1)
      .write.parquet(s"$dir/_delta_log/ckpt")
    val foreignBefore = fs.listFiles(new Path(s"$dir/_delta_log"), true)
    var nForeign = 0
    while (foreignBefore.hasNext) { foreignBefore.next(); nForeign += 1 }

    VersionedTable.convert(spark, dir)
    // exactly the three visible data files imported; the foreign-schema
    // checkpoint under _delta_log contributed neither rows nor schema
    val got = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")), got)
    // vacuum must never reclaim the hidden foreign files
    VersionedTable.append(Seq((4L, "d")).toDF("id", "v"), dir)
    VersionedTable.vacuum(spark, dir, retainVersions = 1, graceMs = 0L)
    val foreignAfter = fs.listFiles(new Path(s"$dir/_delta_log"), true)
    var nAfter = 0
    while (foreignAfter.hasNext) { foreignAfter.next(); nAfter += 1 }
    assert(nAfter == nForeign, "vacuum touched hidden foreign files")
    assert(VersionedTable.read(spark, dir).count() == 4L)

    // converting a FILE fails named
    val f = s"$dir/region=eu.parquet"
    val e = intercept[IllegalArgumentException] {
      VersionedTable.convert(spark, f) }
    assert(e.getMessage.contains("not a directory"), e.getMessage)
  }

  test("DESCRIBE DETAIL + CONVERT TO GRAFT through SqlDml") {
    import graft.sql.SqlDml
    val dir = Files.createTempDirectory("cv_sql").resolve("t").toString
    (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
      .write.parquet(dir)
    val cv = SqlDml.run(spark, s"CONVERT TO GRAFT '$dir'")
    assert(cv.head().getLong(0) == 0L)
    VersionedTable.addConstraint(spark, dir, "id_pos", "id > 0")
    val d = SqlDml.run(spark, s"DESCRIBE DETAIL '$dir'").head()
    assert(d.getAs[String]("format") == "graft-versioned")
    assert(d.getAs[Long]("version") == 1L)
    assert(d.getAs[Long]("num_files") == 1L)
    assert(d.getAs[Long]("num_rows") == 10L)
    assert(d.getAs[scala.collection.Seq[String]]("constraints").toSeq ==
      Seq("id_pos: id > 0"))
    assert(d.getAs[scala.collection.Seq[String]]("writer_features").toSeq ==
      Seq("check-constraints"))
  }
}
