package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Sinks, Sources}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("csv reader honors an explicit schema (no inference scan)") {
    val dir = tmp("csv")
    Files.write(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,amt\n1,1.5\n2,2.5\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amt", DoubleType)))
    val df = Sources.csv(spark, s"$dir/data.csv", Some(schema))
    assert(df.schema == schema)
    assert(df.as[(Long, Double)].collect().sorted.toSeq == Seq((1L, 1.5), (2L, 2.5)))
  }

  test("orc round-trips and pushes filters to the scan") {
    val dir = tmp("orc")
    Sinks.orc((1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v"), s"$dir/t")
    val back = Sources.orc(spark, s"$dir/t").filter(col("id") > 90)
    assert(back.count() == 10)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90"), plan)
  }

  test("readEvolved: additive evolution reads, drift fails loudly with the column named") {
    val dir = tmp("evolve")
    // v1 files (id, v) then v2 files (id, v, extra) — the long-lived-table shape.
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/t")
    Seq((3L, "c", 1.5)).toDF("id", "v", "extra").write.mode("append").parquet(s"$dir/t")
    val v2 = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("v", StringType), StructField("extra", DoubleType)))
    // Contract = newest schema: older rows read with null extra.
    val got = Sources.readEvolved(spark, s"$dir/t", v2)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(got.count() == 3 && got.filter(col("extra").isNull).count() == 2)
    // Contract = old schema: the new upstream column drops silently by
    // default, or fails when the caller wants to NOTICE it.
    val v1 = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    assert(Sources.readEvolved(spark, s"$dir/t", v1).schema.fieldNames.toSeq == Seq("id", "v"))
    val newCol = intercept[IllegalStateException](
      Sources.readEvolved(spark, s"$dir/t", v1, failOnNewColumns = true))
    assert(newCol.getMessage.contains("extra"))
    // A nullable contract column no file carries yet backfills as nulls...
    val v3 = v2.add(StructField("later", LongType, nullable = true))
    assert(Sources.readEvolved(spark, s"$dir/t", v3)
      .filter(col("later").isNull).count() == 3)
    // ...but a required absent column, and a type change, fail loudly.
    intercept[IllegalStateException](Sources.readEvolved(spark, s"$dir/t",
      v2.add(StructField("must", LongType, nullable = false))))
    val typed = intercept[IllegalStateException](Sources.readEvolved(spark, s"$dir/t",
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))))
    assert(typed.getMessage.contains("v:") && typed.getMessage.contains("double"))
  }

  test("compact folds small files into the target count atomically") {
    val dir = tmp("compact")
    val path = s"$dir/t"
    (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "v")
      .repartition(40).write.parquet(path)
    val (before, after) = Sinks.compact(spark, path, targetFileBytes = 1L << 30)
    assert(before >= 40, s"fixture should start fragmented, had $before files")
    assert(after == 1, s"one target-sized file expected, got $after")
    val back = spark.read.parquet(path)
    assert(back.count() == 1000 && back.agg(sum(col("id"))).head().getLong(0) == 500500L)
    // no temp/old leftovers from the swap
    val leftovers = new java.io.File(dir).list().filter(_.startsWith("t."))
    assert(leftovers.isEmpty, s"swap leftovers: ${leftovers.mkString(", ")}")
  }

  test("compact fails fast on a partitioned table root, leaving it untouched") {
    // Pointed at a partitioned ROOT, the unpartitioned rewrite would
    // materialize partition columns as data columns and flatten the
    // layout — the guard must make that a loud error, not a corruption.
    val dir = tmp("compactpart")
    val path = s"$dir/t"
    Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("dt", "v")
      .write.partitionBy("dt").parquet(path)
    val e = intercept[IllegalArgumentException](Sinks.compact(spark, path))
    assert(e.getMessage.contains("partition-style"))
    // layout intact: partition dirs still present, data still readable
    assert(new java.io.File(path).list().exists(_.startsWith("dt=")))
    assert(spark.read.parquet(path).count() == 2)
    // ...while ONE partition directory remains a valid compaction target
    val (_, after) = Sinks.compact(spark, s"$path/dt=2024-01-01")
    assert(after == 1)
  }

  test("zorderWrite clusters both dimensions: thin slabs touch ~sqrt files, not all") {
    val dir = tmp("zorder")
    // 256×256 uniform grid, 16 files → each z-ordered file should cover a
    // ~64×64 REGION; a thin slab in either dimension then crosses ~4
    // region files, while a single-column sort is perfect on its own
    // column and touches EVERY file for the other.
    val data = spark.range(1L << 16).select(
      (col("id") % 256).as("x"), (col("id") / 256).as("y"))
    Sinks.zorderWrite(data, s"$dir/z", "x", "y", nFiles = 16, bits = 8)
    data.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/xsort")
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(col("_metadata.file_name")).distinct().count()
    val xSlab = col("x") >= 100 && col("x") < 105
    val ySlab = col("y") >= 100 && col("y") < 105
    assert(filesTouched(s"$dir/xsort", xSlab) <= 2) // perfect on its sort column
    assert(filesTouched(s"$dir/xsort", ySlab) == 16) // blind on the other
    val (zx, zy) = (filesTouched(s"$dir/z", xSlab), filesTouched(s"$dir/z", ySlab))
    assert(zx <= 8 && zy <= 8, s"z-order locality too weak: x-slab=$zx y-slab=$zy of 16")
    // layout move only — the data itself is intact
    assert(spark.read.parquet(s"$dir/z").count() == (1L << 16))
    assert(spark.read.parquet(s"$dir/z").agg(sum(col("x"))).head().getLong(0) ==
      data.agg(sum(col("x"))).head().getLong(0))
  }

  test("zorderWriteRanked holds the pruning bound on zipf-skewed data where linear binning fails") {
    val dir = tmp("zorder-rank")
    // Zipf-ish x: 256 distinct values v(k)=1e6/k — half the distinct
    // values (and half the ROWS) live below ~78e3, i.e. inside 0.4% of the
    // value range. Linear binning at 8 bits maps that entire dense mass to
    // bin 0-1, so the curve cannot separate it and a selective predicate
    // there degenerates to most files. Rank bins are equi-DEPTH, so the
    // same predicate covers ~2% of rank space and locality survives.
    val data = spark.range(1L << 16).select(
      floor(lit(1000000.0) / ((col("id") % 256) + 1)).cast("double").as("x"),
      (col("id") / 256).cast("double").as("y"))
    Sinks.zorderWriteRanked(data, s"$dir/zr", "x", "y", nFiles = 16, nBins = 256,
      relErr = 1e-3)
    Sinks.zorderWrite(data, s"$dir/zl", "x", "y", nFiles = 16, bits = 8)
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(col("_metadata.file_name")).distinct().count()
    // thin slab in the DENSE region: k in (100..105] ≈ 2% of rows
    val denseSlab = col("x") >= 1000000.0 / 105 && col("x") < 1000000.0 / 100
    // thin slab in the uniform dimension
    val ySlab = col("y") >= 100 && col("y") < 105
    val (rx, ry) = (filesTouched(s"$dir/zr", denseSlab), filesTouched(s"$dir/zr", ySlab))
    val lx = filesTouched(s"$dir/zl", denseSlab)
    assert(rx <= 8 && ry <= 8,
      s"rank-binned locality too weak on zipf data: dense-slab=$rx y-slab=$ry of 16")
    assert(rx < lx, s"rank binning should beat linear on the dense slab: rank=$rx linear=$lx")
    // layout move only — the data itself is intact
    assert(spark.read.parquet(s"$dir/zr").count() == (1L << 16))
    assert(spark.read.parquet(s"$dir/zr").agg(sum(col("x"))).head().getDouble(0) ==
      data.agg(sum(col("x"))).head().getDouble(0))
  }

  test("zorderWrite with precomputed ranges eliminates the min/max pass over the input") {
    val dir = tmp("zorder-once")
    val acc = spark.sparkContext.longAccumulator("zorder-once-rows")
    val base = spark.range(0, 1024, 1, 4)
    val instrumented = spark.createDataFrame(
      base.rdd.map { r => acc.add(1); org.apache.spark.sql.Row(r % 32, r / 32) },
      new org.apache.spark.sql.types.StructType()
        .add("a", org.apache.spark.sql.types.LongType)
        .add("b", org.apache.spark.sql.types.LongType))
    Sinks.zorderWrite(instrumented, s"$dir/z", "a", "b", nFiles = 2, bits = 5,
      ranges = Some((0.0, 31.0, 0.0, 31.0)))
    val withRanges = acc.value
    assert(spark.read.parquet(s"$dir/z").count() == 1024)
    acc.reset()
    Sinks.zorderWrite(instrumented, s"$dir/z2", "a", "b", nFiles = 2, bits = 5)
    val withoutRanges = acc.value
    // The overload's claim: the 4-scalar min/max aggregation pass is GONE —
    // the default runs exactly one more full evaluation of the upstream.
    // (repartitionByRange's range-partitioner sampling is a pass of its
    // own in BOTH variants — inherent to the layout write, not the agg.)
    assert(withoutRanges - withRanges == 1024L,
      s"expected the default to cost exactly one extra upstream pass: " +
        s"with=$withRanges without=$withoutRanges")
    assert(withRanges <= 2048L,
      s"ranges variant must run at most write + partitioner sample: $withRanges")
  }

  test("zorderValue interleaves bits and rejects bad knobs") {
    // Morton property on exact small values: z(1,0)=1 (a bit 0 → pos 0),
    // z(0,1)=2 (b bit 0 → pos 1), z(3,3)=15, z(2,1)=... a=10₂→pos{2}=4?
    // spell out: a bits at even positions, b bits at odd.
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (255L, 0L), (0L, 255L))
      .toDF("a", "b")
    val z = Sinks.zorderValue(col("a"), col("b"), 0, 255, 0, 255, bits = 8)
    val m = df.select(col("a"), col("b"), z.as("z"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(m((0L, 0L)) == 0L)
    assert(m((1L, 0L)) == 1L)   // a's bit 0 → position 0
    assert(m((0L, 1L)) == 2L)   // b's bit 0 → position 1
    assert(m((3L, 3L)) == 15L)  // both low bit-pairs set
    assert(m((255L, 0L)) == 0x5555L) // a fills even positions
    assert(m((0L, 255L)) == 0xAAAAL) // b fills odd positions
    intercept[IllegalArgumentException](
      Sinks.zorderValue(col("a"), col("b"), 0, 255, 0, 255, bits = 40))
    intercept[IllegalArgumentException](
      Sinks.zorderValue(col("a"), col("b"), 5, 5, 0, 255))
    // a pre-existing working column fails fast instead of being clobbered
    val clash = Seq((1L, 2L, 3L)).toDF("a", "b", "_graft_z")
    intercept[IllegalArgumentException](
      Sinks.zorderWrite(clash, "/tmp/never-written", "a", "b", nFiles = 1))
  }

  test("dynamicOverwrite replaces only the partitions present in the batch") {
    val dir = tmp("dynpart")
    val day1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("dt", "v")
    Sinks.overwrite(day1, s"$dir/t", Seq("dt"))
    // restate only 01-02; 01-01 must survive
    val restate = Seq(("2024-01-02", 99L)).toDF("dt", "v")
    Sinks.dynamicOverwrite(restate, s"$dir/t", Seq("dt"))
    val out = spark.read.parquet(s"$dir/t").select("dt", "v")
      .as[(String, Long)].collect().sorted.toSeq
    assert(out == Seq(("2024-01-01", 1L), ("2024-01-02", 99L)))
  }

  // Embedded Derby (ships with Spark's jars) stands in for the reference's
  // SQL-database sources — same JDBC surface, zero egress.
  private def derby(db: String): String = {
    val url = s"jdbc:derby:memory:$db;create=true"
    java.sql.DriverManager.getConnection(url).close()
    url
  }

  test("jdbc reader pulls a table and pushes filters into the database query") {
    val url = derby("srcdb")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE tx (id BIGINT, ts TIMESTAMP, amt DOUBLE)")
      st.execute("INSERT INTO tx VALUES " +
        "(1, TIMESTAMP('2024-01-01 10:00:00'), 10.0)," +
        "(2, TIMESTAMP('2024-01-02 10:00:00'), 20.0)," +
        "(3, TIMESTAMP('2024-01-03 10:00:00'), 30.0)")
    } finally conn.close()
    val df = Sources.jdbc(spark, url, "tx")
      .filter(col("ts") > lit("2024-01-01 12:00:00").cast("timestamp"))
    assert(df.count() == 2)
    // the watermark predicate must reach the DB, not filter post-transfer
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(TS"), plan)
  }

  test("jdbc partitioned read splits the table across parallel cursors") {
    val url = derby("pardb")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE big (id BIGINT, v DOUBLE)")
      (1 to 100).grouped(20).foreach { g =>
        st.execute("INSERT INTO big VALUES " +
          g.map(i => s"($i, ${i * 1.5})").mkString(","))
      }
    } finally conn.close()
    val df = Sources.jdbc(spark, url, "big", partitioning = Some(("id", 1L, 101L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(sum("v")).head.getDouble(0) == (1 to 100).map(_ * 1.5).sum)
  }

  test("ApiExtract parses FX payloads, lands bronze, and serves latest rates") {
    import graft.sources.ApiExtract
    val dir = tmp("fx")
    val payloads = Seq(
      """{"base":"EUR","as_of":"2024-01-04","rates":{"USD":1.08,"GBP":0.85}}""",
      """{"base":"EUR","as_of":"2024-01-05","rates":{"USD":1.09,"GBP":0.86,"JPY":158.2}}""",
      """not json at all""")
    val written = ApiExtract.landFx(spark, payloads, s"$dir/bronze")
    assert(written == 5) // 2 + 3 rates; malformed snapshot skipped
    val latest = ApiExtract.latestRates(spark.read.parquet(s"$dir/bronze"))
      .select("currency", "rate").as[(String, Double)].collect().toMap
    assert(latest == Map("USD" -> 1.09, "GBP" -> 0.86, "JPY" -> 158.2))
    // a second run appends; latest view is unchanged by older snapshots
    ApiExtract.landFx(spark,
      Seq("""{"base":"EUR","as_of":"2024-01-03","rates":{"USD":1.01}}"""), s"$dir/bronze")
    val latest2 = ApiExtract.latestRates(spark.read.parquet(s"$dir/bronze"))
      .filter(col("currency") === "USD").select("rate").as[Double].head()
    assert(latest2 == 1.09)
  }

  test("ApiExtract.fetchWithRetry: transient failures retry with backoff, hangs time out") {
    import graft.sources.ApiExtract
    // Succeeds on attempt 3; sleeps recorded, not slept (injectable clock).
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val got = ApiExtract.fetchWithRetry(
      () => { calls += 1; if (calls < 3) throw new RuntimeException("503") else "body" },
      maxAttempts = 3, backoffMs = 100, sleep = slept += _)
    assert(got == "body" && calls == 3)
    assert(slept.toSeq == Seq(100L, 200L), s"backoff must double: $slept")
    // Exhausted attempts carry the LAST cause out.
    val failed = intercept[ApiExtract.FetchFailed](ApiExtract.fetchWithRetry(
      () => throw new RuntimeException("boom"), maxAttempts = 2, sleep = _ => ()))
    assert(failed.attempts == 2 && failed.cause.getMessage == "boom")
    // A hung endpoint costs one bounded timeout per attempt, not a wedge.
    val hung = intercept[ApiExtract.FetchFailed](ApiExtract.fetchWithRetry(
      () => { Thread.sleep(60000); "never" },
      maxAttempts = 1, attemptTimeoutMs = 200))
    assert(hung.cause.isInstanceOf[java.util.concurrent.TimeoutException])
  }

  test("ApiExtract.landFxValidated fails loudly when a batch parses to nothing") {
    import graft.sources.ApiExtract
    val dir = tmp("fxv")
    // Healthy batch with one bad snapshot: lands fine (skip-bad contract).
    val ok = ApiExtract.landFxValidated(spark, Seq(
      """{"base":"EUR","as_of":"2024-01-04","rates":{"USD":1.08}}""",
      "garbage"), s"$dir/bronze")
    assert(ok == 1)
    // Endpoint shape change (every payload malformed): must fail the run,
    // not land an empty append that reads as a clean load.
    intercept[IllegalArgumentException](
      ApiExtract.landFxValidated(spark, Seq("garbage", "also garbage"), s"$dir/bronze"))
    assert(spark.read.parquet(s"$dir/bronze").count() == 1, "failed batch must land nothing")
  }

  test("overwriteAtomic swaps cleanly: data replaced, no temp/old leftovers") {
    val dir = tmp("atomic")
    val path = s"$dir/t"
    Sinks.overwriteAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    Sinks.overwriteAtomic(Seq((3L, "c")).toDF("id", "v"), path)
    val out = spark.read.parquet(path).as[(Long, String)].collect().toSeq
    assert(out == Seq((3L, "c")))
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.contains("__tmp") || n.contains("__old"))
    assert(leftovers.isEmpty, s"swap left garbage: ${leftovers.toSeq}")
  }

  test("publishVersioned survives a crashed publish; readers follow the pointer") {
    val dir = tmp("versioned")
    val path = s"$dir/t"
    val v1 = Sinks.publishVersioned(Seq((1L, "a")).toDF("id", "v"), path)
    assert(Sinks.readCurrent(spark, path).as[(Long, String)].collect().toSeq == Seq((1L, "a")))

    // Simulated crash: a publish died after writing its version dir but
    // BEFORE the pointer replace — readers must still see v1.
    val crashed = new java.io.File(s"$path/v-crashed")
    crashed.mkdirs()
    Files.write(java.nio.file.Paths.get(s"$path/v-crashed/part-00000.parquet"),
      "half-written garbage".getBytes)
    assert(Sinks.readCurrent(spark, path).as[(Long, String)].collect().toSeq == Seq((1L, "a")))

    // Next successful publish goes live and prunes the crash garbage;
    // the immediately-previous version survives for in-flight readers.
    val v2 = Sinks.publishVersioned(Seq((2L, "b")).toDF("id", "v"), path)
    assert(Sinks.readCurrent(spark, path).as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("v-")).toSet
    assert(dirs == Set(v1, v2), s"expected {$v1, $v2}, found $dirs")

    // One more publish: v1 ages out, v2 is retained as previous.
    val v3 = Sinks.publishVersioned(Seq((3L, "c")).toDF("id", "v"), path)
    val dirs2 = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("v-")).toSet
    assert(dirs2 == Set(v2, v3))
    assert(Sinks.readCurrent(spark, path).as[(Long, String)].collect().toSeq == Seq((3L, "c")))
  }

  test("publishVersioned: competing same-seq publish aborts loudly, pointer untouched") {
    val dir = tmp("race")
    val path = s"$dir/t"
    val v1 = Sinks.publishVersioned(Seq((1L, "a")).toDF("id", "v"), path)

    // The next publish will claim seq 2. Simulate a rival publisher winning
    // the race inside the check window by materializing its same-seq version
    // dir DURING our data write (the write evaluates this plan), i.e.
    // between our seq selection and the post-write guard re-list.
    val rivalDir = new java.io.File(s"$path/v-000000002-abcdef01")
    import spark.implicits._
    val injecting = spark.range(0, 4).mapPartitions { it =>
      rivalDir.mkdirs(); it
    }.toDF("id")
    val e = intercept[RuntimeException](Sinks.publishVersioned(injecting, path))
    assert(e.getMessage.contains("concurrent publish detected"),
      s"wrong error: ${e.getMessage}")

    // Live pointer still resolves v1; our aborted v-dir was removed (only
    // v1 and the rival's dir remain).
    assert(Sinks.readCurrent(spark, path).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("v-")).toSet
    assert(dirs == Set(v1, rivalDir.getName), s"unexpected dirs: $dirs")
  }

  test("readVersion time-travels retained versions; history orders and prunes") {
    val dir = tmp("timetravel")
    val path = s"$dir/t"
    val v1 = Sinks.publishVersioned(Seq((1L, "a")).toDF("id", "v"), path, keepVersions = 3)
    val v2 = Sinks.publishVersioned(Seq((2L, "b")).toDF("id", "v"), path, keepVersions = 3)
    val v3 = Sinks.publishVersioned(Seq((3L, "c")).toDF("id", "v"), path, keepVersions = 3)
    // by returned name and by bare seq (VERSION AS OF n)
    assert(Sinks.readVersion(spark, path, v1).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(Sinks.readVersion(spark, path, "2").as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    val hist = Sinks.versionHistory(spark, path)
      .select("seq", "version", "is_current").as[(Long, String, Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(hist.map(_._1) == Seq(1L, 2L, 3L))
    assert(hist.map(_._2) == Seq(v1, v2, v3))
    assert(hist.collect { case (_, v, true) => v } == Seq(v3))
    // v4 ages v1 out of keepVersions=3 retention; reading it names the cause
    val v4 = Sinks.publishVersioned(Seq((4L, "d")).toDF("id", "v"), path, keepVersions = 3)
    assert(Sinks.versionHistory(spark, path).count() == 3)
    val err = intercept[RuntimeException](Sinks.readVersion(spark, path, v1))
    assert(err.getMessage.contains("not retained"), err.getMessage)
    assert(Sinks.readVersion(spark, path, "4").as[(Long, String)].collect().toSeq == Seq((4L, "d")))
    assert(Sinks.readCurrent(spark, path).as[(Long, String)].collect().toSeq == Seq((4L, "d")))
  }

  test("csvQuarantined routes malformed rows to quarantine, loads the rest") {
    val dir = tmp("csvq")
    Files.write(java.nio.file.Paths.get(s"$dir/data.csv"),
      ("id,ts,amt\n" +
        "1,2024-01-01 10:00:00,10.5\n" +
        "2,not-a-timestamp,20.0\n" +
        "3,2024-01-03 10:00:00,30.5\n" +
        "4,2024-01-04 10:00:00,not-a-number\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("amt", DoubleType)))
    val (good, bad) = Sources.csvQuarantined(spark, s"$dir/data.csv", schema)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val raw = bad.as[String].collect()
    assert(raw.length == 2 && raw.exists(_.contains("not-a-timestamp"))
      && raw.exists(_.contains("not-a-number")), raw.toSeq)
  }

  test("jsonQuarantined routes unparseable lines to quarantine") {
    val dir = tmp("jsonq")
    Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      ("{\"id\":1,\"v\":\"a\"}\n" +
        "{\"id\":2,\"v\":\n" +
        "{\"id\":3,\"v\":\"c\"}\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val (good, bad) = Sources.jsonQuarantined(spark, s"$dir/d.json", schema)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(bad.as[String].collect().toSeq == Seq("{\"id\":2,\"v\":"))
  }

  test("stats skipping: pruned read touches fewer files, equals the full-scan filter") {
    val dir = tmp("skip")
    val path = s"$dir/lineitem"
    // range-partition by key so each file covers a contiguous key range —
    // the layout readSkipping exists to exploit
    Tables.lineitem(spark, sfDir).repartitionByRange(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(path)
    Sinks.writeStatsManifest(spark, path, Seq("l_orderkey", "l_quantity"))
    val all = spark.read.parquet(path)
    val keys = all.select(col("l_orderkey")).as[Long].collect().sorted
    val (lo, hi) = (keys(keys.length / 4), keys(keys.length / 4 + keys.length / 16))
    val skipped = Sinks.readSkipping(spark, path, "l_orderkey", lo, hi)
    assert(skipped.inputFiles.length < all.inputFiles.length,
      s"no files pruned: ${skipped.inputFiles.length} of ${all.inputFiles.length}")
    val expect = all.filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val got = skipped.select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == expect)
    // empty intersection: zero rows without touching any data file
    assert(Sinks.readSkipping(spark, path, "l_orderkey",
      keys.last + 1000L, keys.last + 2000L).count() == 0)
  }

  test("stats skipping tolerates zero-row part files (manifest covers them, reads skip them)") {
    val dir = tmp("skip_zero")
    val path = s"$dir/t"
    // 3 rows round-robined over 8 partitions → ≥ 5 zero-row part files
    Tables.lineitem(spark, sfDir).limit(3).repartition(8)
      .write.mode("overwrite").parquet(path)
    val nFiles = spark.read.parquet(path).inputFiles.length
    Sinks.writeStatsManifest(spark, path, Seq("l_orderkey"))
    val manifest = spark.read.parquet(s"$path/_graft_stats")
    assert(manifest.count() == nFiles,
      s"manifest must cover every data file: ${manifest.count()} vs $nFiles")
    // a fresh manifest must NOT read as stale, and results stay exact
    val keys = spark.read.parquet(path).select(col("l_orderkey")).as[Long].collect()
    val got = Sinks.readSkipping(spark, path, "l_orderkey", keys.min, keys.max)
      .count()
    assert(got == 3, s"expected 3 rows, got $got")
    if (nFiles > 3) {
      // zero-row files must be skippable: null stats never intersect
      val pruned = Sinks.readSkipping(spark, path, "l_orderkey", keys.min, keys.min)
      assert(pruned.inputFiles.length <= 3, pruned.inputFiles.length.toString)
    }
  }

  test("stats skipping pays for z-order: a 2-D predicate prunes files multiplicatively") {
    val dir = tmp("skip_z")
    val path = s"$dir/li"
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber"))
    Sinks.zorderWrite(li, path, "l_orderkey", "l_quantity", nFiles = 16)
    Sinks.writeStatsManifest(spark, path, Seq("l_orderkey", "l_quantity"))
    val all = spark.read.parquet(path)
    val keys = all.select(col("l_orderkey")).as[Long].collect().sorted
    val (kLo, kHi) = (keys(keys.length / 3), keys(keys.length / 3 + keys.length / 8))
    val preds = Seq[(String, Any, Any)](
      ("l_orderkey", kLo, kHi), ("l_quantity", 5.0, 15.0))
    val skipped = Sinks.readSkipping(spark, path, preds)
    // a thin 2-D region of a 16-file z-layout must not touch most files
    assert(skipped.inputFiles.length <= 8,
      s"2-D pruning too weak: ${skipped.inputFiles.length} of ${all.inputFiles.length}")
    val expect = all.filter(col("l_orderkey").between(kLo, kHi) &&
        col("l_quantity").between(5.0, 15.0))
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val got = skipped.select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == expect)
  }

  test("stats skipping fails named on stale manifests and unindexed columns") {
    val dir = tmp("skip_stale")
    val path = s"$dir/t"
    Tables.lineitem(spark, sfDir).limit(100)
      .write.mode("overwrite").parquet(path)
    // missing manifest
    val none = intercept[IllegalArgumentException] {
      Sinks.readSkipping(spark, path, "l_orderkey", 1L, 2L)
    }
    assert(none.getMessage.contains("no stats manifest"), none.getMessage)
    Sinks.writeStatsManifest(spark, path, Seq("l_orderkey"))
    // unindexed column
    val unidx = intercept[IllegalArgumentException] {
      Sinks.readSkipping(spark, path, "l_quantity", 1.0, 2.0)
    }
    assert(unidx.getMessage.contains("not indexed"), unidx.getMessage)
    // append a file AFTER the manifest → stale, named
    Tables.lineitem(spark, sfDir).limit(10)
      .write.mode("append").parquet(path)
    val stale = intercept[IllegalArgumentException] {
      Sinks.readSkipping(spark, path, "l_orderkey", 1L, 2L)
    }
    assert(stale.getMessage.contains("STALE"), stale.getMessage)
    // partitioned roots are rejected loudly — a per-file re-read would
    // silently drop hive partition-column values (the compact() contract)
    val pdir = s"$dir/pt"
    Tables.lineitem(spark, sfDir).limit(50)
      .withColumn("flag", col("l_linenumber") % 2)
      .write.partitionBy("flag").mode("overwrite").parquet(pdir)
    val part = intercept[IllegalArgumentException] {
      Sinks.writeStatsManifest(spark, pdir, Seq("l_orderkey"))
    }
    assert(part.getMessage.contains("partition-style"), part.getMessage)
  }

  test("partitioned stats skipping: value+stat pruning, exact rows, typed partition cols (i16)") {
    val dir = tmp("skip_part")
    val path = s"$dir/li"
    // partition by a derived flag; range-partition within so key stats prune
    Tables.lineitem(spark, sfDir)
      .withColumn("flag", (col("l_linenumber") % 3).cast("int"))
      .repartitionByRange(4, col("l_orderkey"))
      .write.partitionBy("flag").mode("overwrite").parquet(path)
    // the unpartitioned writer refuses; the partitioned one covers it
    intercept[IllegalArgumentException] {
      Sinks.writeStatsManifest(spark, path, Seq("l_orderkey"))
    }
    // partition columns are pruned by VALUE — statsCols naming one fails
    val ov = intercept[IllegalArgumentException] {
      Sinks.writeStatsManifestPartitioned(spark, path, Seq("l_orderkey", "flag"))
    }
    assert(ov.getMessage.contains("pruned by VALUE"), ov.getMessage)
    Sinks.writeStatsManifestPartitioned(spark, path, Seq("l_orderkey"))
    val all = spark.read.parquet(path)
    val nFiles = all.inputFiles.length
    assert(spark.read.parquet(s"$path/_graft_stats").count() == nFiles)
    val keys = all.select(col("l_orderkey")).as[Long].collect().sorted
    val (lo, hi) = (keys(keys.length / 4), keys(keys.length / 2))
    // 2-D conjunction: key range + partition VALUE
    val preds = Seq[(String, Any, Any)](("l_orderkey", lo, hi), ("flag", 1, 1))
    val skipped = Sinks.readSkippingPartitioned(spark, path, preds)
    assert(skipped.inputFiles.length < nFiles,
      s"no files pruned: ${skipped.inputFiles.length} of $nFiles")
    // results EXACTLY equal the full-scan filter, schema incl. typed flag
    assert(skipped.schema("flag").dataType == all.schema("flag").dataType)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_orderkey"), col("l_linenumber"), col("flag")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(key(skipped) == key(all.filter(
      col("l_orderkey").between(lo, hi) && col("flag") === 1)))
    // empty intersection reads no data files, schema intact
    val none = Sinks.readSkippingPartitioned(spark, path,
      Seq(("l_orderkey", keys.last + 10L, keys.last + 20L)))
    assert(none.count() == 0 && none.columns.contains("flag"))
    // append → stale, named
    Tables.lineitem(spark, sfDir).limit(5)
      .withColumn("flag", lit(1))
      .write.partitionBy("flag").mode("append").parquet(path)
    val stale = intercept[IllegalArgumentException] {
      Sinks.readSkippingPartitioned(spark, path, preds)
    }
    assert(stale.getMessage.contains("STALE"), stale.getMessage)
  }

  test("partitioned manifest unescapes hive partition segments for zero-row files") {
    // Hive escapes special characters when writing k=v directories
    // ('a=b' lands as src=a%3Db) and spells null as
    // __HIVE_DEFAULT_PARTITION__. Zero-row part files take their
    // partition value from the path segment, so the manifest must store
    // the UNESCAPED value — or value pruning would drop those files on
    // the escaped spelling ('a%3Db' != 'a=b').
    val dir = tmp("skip_escape")
    val path = s"$dir/t"
    // 2 rows spread over 5 partitions → ≥ 3 zero-row part files, in a
    // partition whose value needs escaping AND one that is null
    Seq((1L, "a=b"), (2L, null.asInstanceOf[String]))
      .toDF("k", "src").repartition(5)
      .write.partitionBy("src").mode("overwrite").parquet(path)
    val escaped = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("src="))
    assert(escaped.contains("src=a%3Db"), escaped.toSeq.toString)
    Sinks.writeStatsManifestPartitioned(spark, path, Seq("k"))
    val manifest = spark.read.parquet(s"$path/_graft_stats")
    // every manifest row holds the unescaped value — zero-row rows match
    // the data-derived spelling exactly
    val vals = manifest.select(col("part_src")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("a=b", null), vals.toString)
    // pruning on the unescaped value keeps the row (and its zero-row
    // partition-mates never block the read)
    val got = Sinks.readSkippingPartitioned(spark, path,
      Seq[(String, Any, Any)](("src", "a=b", "a=b")))
    assert(got.select(col("k")).as[Long].collect().toSeq == Seq(1L))
  }

  test("appendStatsManifest: append-only refresh stats only the new files (i15b)") {
    val dir = tmp("skip_append")
    val path = s"$dir/t"
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_linenumber") =!= 1).repartitionByRange(4, col("l_orderkey"))
      .write.mode("overwrite").parquet(path)
    Sinks.writeStatsManifest(spark, path, Seq("l_orderkey"))
    val before = spark.read.parquet(s"$path/_graft_stats").count()
    // append (including zero-row part files: 3 rows over 8 partitions)
    li.filter(col("l_linenumber") === 1).limit(3).repartition(8)
      .write.mode("append").parquet(path)
    intercept[IllegalArgumentException] { // stale until refreshed
      Sinks.readSkipping(spark, path, "l_orderkey", 1L, 2L)
    }
    Sinks.appendStatsManifest(spark, path)
    val manifest = spark.read.parquet(s"$path/_graft_stats")
    val nFiles = spark.read.parquet(path).inputFiles.length
    assert(manifest.count() == nFiles,
      s"refreshed manifest must cover every file: ${manifest.count()} vs $nFiles")
    assert(manifest.count() > before, "append must add manifest rows")
    // pruned read equals the full-scan filter over old + appended rows
    val all = spark.read.parquet(path)
    val keys = all.select(col("l_orderkey")).as[Long].collect().sorted
    val (lo, hi) = (keys(keys.length / 4), keys(keys.length / 2))
    val got = Sinks.readSkipping(spark, path, "l_orderkey", lo, hi)
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val expect = all.filter(col("l_orderkey").between(lo, hi))
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == expect)
    // idempotent no-op when already current
    Sinks.appendStatsManifest(spark, path)
    assert(spark.read.parquet(s"$path/_graft_stats").count() == nFiles)
    // a compaction/rewrite (not an append) leaves the manifest knowing
    // files that no longer exist → named failure, full rewrite required.
    // (A plain .mode(overwrite) also wipes _graft_stats itself, landing in
    // the no-manifest branch; deleting a data file models the compaction
    // case where the manifest survives but its file set is wrong.)
    val victim = spark.read.parquet(path).inputFiles.head
    Files.delete(java.nio.file.Paths.get(new java.net.URI(victim).getPath))
    val gone = intercept[IllegalArgumentException] {
      Sinks.appendStatsManifest(spark, path)
    }
    assert(gone.getMessage.contains("rewritten/compacted"), gone.getMessage)
    // and with no manifest at all, append refuses (nothing to append to)
    val p2 = s"$dir/t2"
    li.limit(5).write.mode("overwrite").parquet(p2)
    val none = intercept[IllegalArgumentException] {
      Sinks.appendStatsManifest(spark, p2)
    }
    assert(none.getMessage.contains("writeStatsManifest first"), none.getMessage)
  }

  test("textLines: one doc per line, deterministic contiguous ids, feeds the B block") {
    val dir = tmp("textlines")
    Files.write(java.nio.file.Paths.get(s"$dir/corpus.txt"),
      "first document line here\nsecond line of text\nthird one\n".getBytes)
    val df = Sources.textLines(spark, s"$dir/corpus.txt")
    val rows = df.as[(Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L), "contiguous 0-based ids")
    assert(rows(0)._2 == "first document line here" && rows(2)._2 == "third one")
    // stable across re-reads (the min-id keeper family premise)
    assert(Sources.textLines(spark, s"$dir/corpus.txt")
      .as[(Long, String)].collect().sortBy(_._1).toSeq == rows.toSeq)
    // and the frame is directly consumable by the text operators
    assert(graft.text.SpanDedup.novelty(df, "doc_id", "text", 2).count() == 3)
    // r15: id assignment is SHUFFLE-FREE — two map-only scans (per-split
    // counts → driver prefix sum → partition-local ranks). The previous
    // spelling range-shuffled the whole corpus through sortByKey.
    val lineage = df.rdd.toDebugString
    assert(!lineage.contains("Shuffle"), lineage)
  }

  test("textLines ids are a pure function of the file set — split planning can't renumber") {
    // The r12 spelling (textFile + zipWithIndex) was deterministic only
    // for a fixed split plan: a different maxSplitSize/cluster could
    // renumber documents and silently move min-id keepers (q82/q99).
    // Ids now rank (file path, byte offset), so forcing a pathological
    // split plan must yield the SAME ids, and multi-file globs must rank
    // shards in path order with in-file line order inside each.
    val dir = tmp("textlines_stable")
    Files.write(java.nio.file.Paths.get(s"$dir/a_shard.txt"),
      "alpha line one\nalpha line two with more bytes in it\nalpha three\n".getBytes)
    Files.write(java.nio.file.Paths.get(s"$dir/b_shard.txt"),
      "beta first\nbeta second\n".getBytes)
    val normal = Sources.textLines(spark, s"$dir/*.txt")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(normal.map(_._1) == (0L until 5L),
      "contiguous ids across a multi-file glob")
    assert(normal.map(_._2) == Seq(
      "alpha line one", "alpha line two with more bytes in it", "alpha three",
      "beta first", "beta second"), "path order ranks shards, offset order ranks lines")
    // Force many tiny splits (TextInputFormat still stitches lines that
    // straddle split boundaries) and require identical numbering.
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val prior = Option(conf.get(key))
    conf.set(key, "16")
    try {
      val tiny = Sources.textLines(spark, s"$dir/*.txt")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(tiny == normal, "split planning changed the ids")
    } finally prior.fold(conf.unset(key))(conf.set(key, _))
  }

  test("json reader with schema reads nested props") {
    val dir = tmp("json")
    Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      "{\"id\":1,\"props\":{\"k\":5}}\n{\"id\":2,\"props\":{\"k\":7}}\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("props", StructType(Seq(StructField("k", IntegerType))))))
    val df = Sources.json(spark, s"$dir/d.json", Some(schema))
    assert(df.select(col("id"), col("props.k")).as[(Long, Int)].collect().sorted.toSeq
      == Seq((1L, 5), (2L, 7)))
  }
}
