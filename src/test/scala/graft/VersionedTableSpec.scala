package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpTable(tag: String): String =
    Files.createTempDirectory(s"vt_$tag").resolve("t").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("create / append / overwrite with time travel to every version") {
    val t = tmpTable("basic")
    val v0 = VersionedTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    assert(v0 == 0L)
    val v1 = VersionedTable.append(Seq((3L, "c")).toDF("id", "v"), t)
    assert(v1 == 1L)
    val v2 = VersionedTable.overwrite(Seq((9L, "z")).toDF("id", "v"), t)
    assert(v2 == 2L)
    assert(VersionedTable.latestVersion(spark, t) == 2L)

    assert(rows(VersionedTable.read(spark, t)) == Set((9L, "z")))
    assert(rows(VersionedTable.readVersion(spark, t, 0)) == Set((1L, "a"), (2L, "b")))
    assert(rows(VersionedTable.readVersion(spark, t, 1)) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(VersionedTable.readVersion(spark, t, 2)) == Set((9L, "z")))

    // the read plans from the LOG, not a directory listing: a stray
    // parquet dropped into data/ is invisible
    Seq((666L, "ghost")).toDF("id", "v").write
      .parquet(s"$t/${VersionedTable.DataDirName}/files-stray")
    assert(rows(VersionedTable.read(spark, t)) == Set((9L, "z")))

    val h = VersionedTable.history(spark, t)
      .select("version", "op", "n_removes").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // the overwrite removes EVERY live file: create's two part files
    // (two non-empty partitions) plus the append's one
    assert(h == Set((0L, "create", 0), (1L, "append", 0), (2L, "overwrite", 3)))

    // create over an existing table fails named
    val dup = intercept[IllegalArgumentException] {
      VersionedTable.create(Seq((1L, "x")).toDF("id", "v"), t)
    }
    assert(dup.getMessage.contains("already exists"))
  }

  test("schema drift on append fails named; column order is forgiven") {
    val t = tmpTable("schema")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)
    // reordered columns align silently (same set, same types)
    VersionedTable.append(Seq(("b", 2L)).toDF("v", "id"), t)
    assert(rows(VersionedTable.read(spark, t)) == Set((1L, "a"), (2L, "b")))
    // a missing / extra column fails named
    val missing = intercept[IllegalArgumentException] {
      VersionedTable.append(Seq(Tuple1(3L)).toDF("id"), t)
    }
    assert(missing.getMessage.contains("schema drift") &&
      missing.getMessage.contains("missing v"), missing.getMessage)
    // a changed type fails named, never silently casts
    val retyped = intercept[IllegalArgumentException] {
      VersionedTable.append(Seq((4, "d")).toDF("id", "v"), t)
    }
    assert(retyped.getMessage.contains("changed type") &&
      retyped.getMessage.contains("id"), retyped.getMessage)
    // failed appends committed nothing
    assert(VersionedTable.latestVersion(spark, t) == 1L)
  }

  test("a torn commit file fails reads named — never a half-applied transaction") {
    val t = tmpTable("torn")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)
    // a commit file missing its terminal marker (writer died mid-publish)
    val torn = new Path(s"$t/${VersionedTable.LogDirName}/${"0" * 19}1.json")
    val out = fs.create(torn, false)
    out.write("{\"add\":{\"path\":\"data/files-dead/part-0.parquet\",\"rows\":1}}\n".getBytes)
    out.close()
    val e = intercept[RuntimeException] { VersionedTable.read(spark, t) }
    assert(e.getMessage.contains("terminal commit marker") &&
      e.getMessage.contains("manual recovery"), e.getMessage)
  }

  test("losing the publish race retries at the next version") {
    val t = tmpTable("race")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)
    // a concurrent writer took version 1: a complete foreign commit file
    val foreign = new Path(s"$t/${VersionedTable.LogDirName}/${"0" * 19}1.json")
    val out = fs.create(foreign, false)
    out.write("{\"commit\":{\"op\":\"append\"}}\n".getBytes)
    out.close()
    // our append must land at version 2, not clobber 1
    val v = VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), t)
    assert(v == 2L)
    assert(rows(VersionedTable.read(spark, t)) == Set((1L, "a"), (2L, "b")))
  }

  test("txnAppend is idempotent per (app, batch) — the streaming replay contract") {
    val t = tmpTable("txn")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)
    val first = VersionedTable.txnAppend(Seq((2L, "b")).toDF("id", "v"), t, "job", 0L)
    assert(first.contains(1L))
    // the replay: same (app, batch) commits NOTHING
    val replay = VersionedTable.txnAppend(Seq((2L, "b")).toDF("id", "v"), t, "job", 0L)
    assert(replay.isEmpty)
    assert(rows(VersionedTable.read(spark, t)) == Set((1L, "a"), (2L, "b")))
    assert(VersionedTable.latestVersion(spark, t) == 1L)
    // the replay's never-referenced data files were swept, not leaked
    val dataDirs = fs.listStatus(new Path(s"$t/${VersionedTable.DataDirName}"))
    assert(dataDirs.length == 2, dataDirs.map(_.getPath.getName).mkString(", "))
    // a NEW batch from the same app commits; an OLD one (regression) skips
    assert(VersionedTable.txnAppend(Seq((3L, "c")).toDF("id", "v"), t, "job", 1L).contains(2L))
    assert(VersionedTable.txnAppend(Seq((0L, "x")).toDF("id", "v"), t, "job", 0L).isEmpty)
    // a different app is independent
    assert(VersionedTable.txnAppend(Seq((4L, "d")).toDF("id", "v"), t, "other", 0L).contains(3L))
    assert(rows(VersionedTable.read(spark, t)) ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("readChangesSince serves exactly the appended rows; an overwrite breaks it named") {
    val t = tmpTable("cdc")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)
    VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), t)
    VersionedTable.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), t)
    assert(rows(VersionedTable.readChangesSince(spark, t, 0L)) ==
      Set((2L, "b"), (3L, "c"), (4L, "d")))
    assert(rows(VersionedTable.readChangesSince(spark, t, 1L)) ==
      Set((3L, "c"), (4L, "d")))
    assert(VersionedTable.readChangesSince(spark, t, 2L).count() == 0L)
    VersionedTable.overwrite(Seq((9L, "z")).toDF("id", "v"), t)
    val e = intercept[RuntimeException] {
      VersionedTable.readChangesSince(spark, t, 1L)
    }
    assert(e.getMessage.contains("full overwrite") &&
      e.getMessage.contains("reconsume"), e.getMessage)
    // ... but changes since the overwrite itself flow again
    VersionedTable.append(Seq((10L, "y")).toDF("id", "v"), t)
    assert(rows(VersionedTable.readChangesSince(spark, t, 3L)) == Set((10L, "y")))
  }

  test("checkpoints bound replay: latest reads survive losing pre-checkpoint commits") {
    val t = tmpTable("ckpt")
    VersionedTable.create(Seq((0L, "r0")).toDF("id", "v"), t)
    (1 to 12).foreach { i =>
      VersionedTable.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), t)
    }
    val ckpt = new Path(s"$t/${VersionedTable.LogDirName}/${"0" * 18}10.checkpoint.json")
    assert(fs.exists(ckpt), "checkpoint at version 10 missing")
    val want = (0 to 12).map(i => (i.toLong, s"r$i")).toSet
    assert(rows(VersionedTable.read(spark, t)) == want)
    // delete the pre-checkpoint commit files: latest reads must still plan
    // (they start from the checkpoint) — proof the checkpoint is USED
    (1 to 9).foreach { v =>
      fs.delete(new Path(f"$t/${VersionedTable.LogDirName}/$v%020d.json"), false)
    }
    assert(rows(VersionedTable.read(spark, t)) == want)
    assert(rows(VersionedTable.readVersion(spark, t, 11)) ==
      (0 to 11).map(i => (i.toLong, s"r$i")).toSet)
  }

  test("vacuum deletes unreferenced files and orphans; below-horizon time travel fails named") {
    val t = tmpTable("vac")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)      // v0
    VersionedTable.overwrite(Seq((2L, "b")).toDF("id", "v"), t)   // v1
    VersionedTable.append(Seq((3L, "c")).toDF("id", "v"), t)      // v2
    // an orphan from a crashed writer: data files, no commit
    Seq((666L, "ghost")).toDF("id", "v").write
      .parquet(s"$t/${VersionedTable.DataDirName}/files-orphan")
    val before = rows(VersionedTable.read(spark, t))
    // grace 0 — the test's files are seconds old; production default (24 h)
    // protects a concurrent writer's not-yet-committed data files
    val deleted = VersionedTable.vacuum(spark, t, retainVersions = 2,
      graceMs = 0L) // keeps v1, v2
    assert(deleted >= 2, s"deleted only $deleted files") // v0's file + the orphan
    // latest and retained versions still read exactly
    assert(rows(VersionedTable.read(spark, t)) == before)
    assert(rows(VersionedTable.readVersion(spark, t, 1)) == Set((2L, "b")))
    assert(rows(VersionedTable.readVersion(spark, t, 2)) == Set((2L, "b"), (3L, "c")))
    // the orphan directory is gone
    assert(!fs.exists(new Path(s"$t/${VersionedTable.DataDirName}/files-orphan")))
    // below the horizon: named failure, not a FileNotFound surprise
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, t, 0)
    }
    assert(e.getMessage.contains("vacuumed") &&
      e.getMessage.contains("horizon"), e.getMessage)
    // vacuum logged itself: history shows the op, latest bumped
    val ops = VersionedTable.history(spark, t).select("op")
      .collect().map(_.getString(0))
    assert(ops.count(_ == "vacuum") == 1)
    // the GRACE WINDOW: a fresh unreferenced file (a concurrent writer's
    // not-yet-committed data) survives a default-grace vacuum
    Seq((667L, "inflight")).toDF("id", "v").write
      .parquet(s"$t/${VersionedTable.DataDirName}/files-inflight")
    VersionedTable.vacuum(spark, t, retainVersions = 2) // default 24 h grace
    assert(fs.exists(new Path(s"$t/${VersionedTable.DataDirName}/files-inflight")),
      "vacuum deleted a within-grace unreferenced file — a concurrent " +
        "writer's uncommitted data would be destroyed")
  }

  test("appendEvolve: new columns widen the schema, omitted columns land " +
      "NULL, history keeps its shape, retypes still fail named") {
    val t = tmpTable("evolve")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)
    // a source starts shipping an extra column: the table widens
    VersionedTable.appendEvolve(
      Seq((2L, "b", 0.5)).toDF("id", "v", "score"), t)
    val widened = VersionedTable.read(spark, t)
    assert(widened.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    val byId = widened.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2), "pre-widening rows read the new column as NULL")
    assert(byId(2L).getDouble(2) == 0.5)
    // a frame OMITTING a column under evolve: typed NULLs, no failure
    VersionedTable.appendEvolve(Seq(Tuple1(3L)).toDF("id"), t)
    val r3 = VersionedTable.read(spark, t).filter(col("id") === 3L).collect()(0)
    assert(r3.isNullAt(1) && r3.isNullAt(2))
    // time travel below the widening serves the ORIGINAL schema
    assert(VersionedTable.readVersion(spark, t, 0)
      .schema.fieldNames.toSeq == Seq("id", "v"))
    // plain append still enforces strictly — evolution is the caller's
    // explicit choice, never a default
    val strict = intercept[IllegalArgumentException] {
      VersionedTable.append(Seq((4L, "d", 1.0, true)).toDF("id", "v", "score", "flag"), t)
    }
    assert(strict.getMessage.contains("schema drift"), strict.getMessage)
    // a retype under evolve fails named — widening never retypes
    val retyped = intercept[IllegalArgumentException] {
      VersionedTable.appendEvolve(Seq((5, "e")).toDF("id", "v"), t)
    }
    assert(retyped.getMessage.contains("never retypes"), retyped.getMessage)
  }

  test("publish temps are invisible to readers and swept by vacuum") {
    val t = tmpTable("tmps")
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), t)
    // a crashed publisher's straggler: written, never renamed
    val straggler = new Path(
      s"$t/${VersionedTable.LogDirName}/.${"0" * 19}1.json.dead.tmp")
    val out = fs.create(straggler, false)
    out.write("{\"add\":{\"path\":\"data/x/y.parquet\",\"rows\":1}}\n".getBytes)
    out.close()
    // reads and writes are unaffected (listLog matches only NNN.json)
    assert(rows(VersionedTable.read(spark, t)) == Set((1L, "a")))
    assert(VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), t) == 1L)
    // zero-grace vacuum sweeps it
    VersionedTable.vacuum(spark, t, retainVersions = 2, graceMs = 0L)
    assert(!fs.exists(straggler), "vacuum left the publish straggler")
  }

  test("the reference's MERGE-into-Delta pattern: Scd2.merge commits as a " +
      "version, time travel serves the pre-merge dimension") {
    // 4_silver/silver_customers.py:103-170 runs two Delta MERGEs per batch;
    // the re-expression is Scd2.merge (one transform) + a versioned
    // overwrite commit — and what Delta gives for free (the pre-merge
    // snapshot) time travel gives here.
    val t = tmpTable("scd2")
    val ts = (d: Int) => new java.sql.Timestamp(d * 86400000L)
    val dim0 = Seq(
      (1L, "addr-a", ts(1), null.asInstanceOf[java.sql.Timestamp], true),
      (2L, "addr-b", ts(1), null.asInstanceOf[java.sql.Timestamp], true))
      .toDF("id", "addr", "valid_from", "valid_to", "is_current")
    VersionedTable.create(dim0, t)
    val staged = Seq((1L, "addr-a2"), (3L, "addr-c")).toDF("id", "addr")
    val merged = graft.ops.Scd2.merge(VersionedTable.read(spark, t), staged,
      Seq("id"), Seq("addr"), lit(ts(2)))
    val v = VersionedTable.overwrite(merged, t)
    val cur = VersionedTable.read(spark, t).filter(col("is_current"))
      .select(col("id"), col("addr")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cur == Set((1L, "addr-a2"), (2L, "addr-b"), (3L, "addr-c")))
    // the expired version is retained with its close-out timestamp
    val expired = VersionedTable.read(spark, t)
      .filter(!col("is_current") && col("id") === 1L).collect()
    assert(expired.length == 1 &&
      expired(0).getAs[java.sql.Timestamp]("valid_to") == ts(2))
    // and the pre-merge dimension is served exactly by time travel
    assert(VersionedTable.readVersion(spark, t, v - 1).collect().toSet ==
      dim0.collect().toSet)
  }

  test("concurrent writers: every append lands exactly once under the " +
      "hard-link put-if-absent race") {
    val t = tmpTable("race8")
    VersionedTable.create(Seq((-1L, "seed")).toDF("id", "v"), t)
    // 8 threads × 3 appends, all racing for version slots; the loser of a
    // slot must retry at the next — never replace, never double-commit
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val work = Future.sequence((0 until 8).map { w =>
      Future {
        (0 until 3).map { k =>
          VersionedTable.append(
            Seq(((w * 3 + k).toLong, s"w$w-$k")).toDF("id", "v"), t)
        }
      }
    })
    val versions = Await.result(work, 120.seconds).flatten
    pool.shutdown()
    // 24 appends → 24 DISTINCT versions 1..24 (no slot won twice)
    assert(versions.toSet == (1L to 24L).toSet,
      s"versions not unique/contiguous: ${versions.sorted}")
    // and every row landed exactly once
    val got = VersionedTable.read(spark, t).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got == (-1L until 24L).toSeq, s"rows lost or duplicated: $got")
  }

  test("empty appends and empty tables round-trip with the declared schema") {
    val t = tmpTable("empty")
    val df = Seq((1L, "a")).toDF("id", "v")
    VersionedTable.create(df.filter(lit(false)), t)
    val empty = VersionedTable.read(spark, t)
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "v"))
    VersionedTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    assert(rows(VersionedTable.read(spark, t)) == Set((1L, "a")))
  }
}
