package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.meta.{Audit, LoadConfig}

class MetaSpec extends SparkSpec {
  import spark.implicits._

  test("LoadConfig reads active entries with optional watermark columns") {
    val dir = Files.createTempDirectory("cfg").toFile.getAbsolutePath
    Files.writeString(java.nio.file.Paths.get(s"$dir/load_config.csv"),
      """source_type,table_name,is_active,load_mode,watermark_column
        |sql,accounts,1,full,
        |sql,customers,1,incremental,updated_at
        |sql,legacy,0,full,
        |""".stripMargin)
    val entries = LoadConfig.activeEntries(spark, s"$dir/load_config.csv")
    assert(entries.map(_.tableName).toSet == Set("accounts", "customers"))
    assert(entries.find(_.tableName == "customers").get.watermarkColumn.contains("updated_at"))
    assert(entries.find(_.tableName == "accounts").get.watermarkColumn.isEmpty)
  }

  test("Audit logs runs and captures new watermarks") {
    val dir = Files.createTempDirectory("audit").toFile.getAbsolutePath
    val run = Audit.Run("r1", "", "events", "incremental", "ts", "2024-01-30", 1000L,
      "SUCCESS", new Timestamp(0), new Timestamp(1000))
    Audit.log(spark, s"$dir/log", run)
    Audit.log(spark, s"$dir/log", run.copy(run_id = "r2", status = "FAILED",
      end_time = new Timestamp(2000)))
    val latest = Audit.latestRuns(spark, s"$dir/log").collect()
    assert(latest.length == 1 && latest(0).getAs[String]("run_id") == "r2")

    val wm = Audit.newWatermark(Tables.events(spark, sfDir), "ts")
    assert(wm.exists(_.startsWith("2024-01-30")))
    val none = Audit.newWatermark(Tables.events(spark, sfDir).filter(lit(false)), "ts")
    assert(none.isEmpty)
  }
}
