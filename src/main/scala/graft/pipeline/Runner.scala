package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.{Audit, LoadConfig}
import graft.ops.Incremental

/** Metadata-driven ingest orchestrator — the engine-side equivalent of the
  * reference's ADF pipeline loop (reference:
  * 2_bronze_ingestion_adf/pipelines JSON definitions: ForEach over load_config rows →
  * per-table copy with full/incremental branch → audit start/end +
  * watermark capture): enumerate active config entries, run each table's
  * load with per-table failure isolation, append one audit row per load,
  * and carry watermarks forward run-to-run through the audit log.
  *
  * Scale: the config and audit tables are metadata-rate (rows per RUN, not
  * per data row); per-table loads are independent Catalyst plans —
  * incremental windows push the watermark predicate into the scan, full
  * loads are straight scans. Tables can be dispatched concurrently by the
  * caller (each load is a self-contained job), mirroring ADF's parallel
  * ForEach.
  */
object Runner {

  final case class LoadResult(
      table: String, mode: String, rows: Long, status: String,
      newWatermark: Option[String])

  /** Last successful watermark per table from the audit log. */
  private def lastWatermarks(spark: SparkSession, auditDir: String): Map[String, String] =
    try {
      Audit.latestRuns(spark, auditDir)
        .filter(col("status") === "succeeded" && col("watermark_value").isNotNull)
        .select(col("source_object"), col("watermark_value"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    } catch { case _: Exception => Map.empty } // first run: no audit log yet

  /** Run every active config entry: read via `source`, optionally window to
    * rows past the last watermark, apply the table's silver `transform`
    * (identity when absent), write parquet under `outDir/<table>`
    * (append for incremental loads, overwrite for full refreshes), and
    * audit the outcome. A failing table records a `failed` audit row and
    * does not stop the remaining tables.
    */
  def run(spark: SparkSession, configPath: String, outDir: String, auditDir: String,
      runId: String, source: String => DataFrame,
      transform: Map[String, DataFrame => DataFrame] = Map.empty,
      maxAttempts: Int = 1): Seq[LoadResult] = {
    val watermarks = lastWatermarks(spark, auditDir)

    // ADF-style per-activity retry: transient source failures re-attempt up
    // to maxAttempts before the table is audited as failed.
    def attempt[T](left: Int)(f: => T): T =
      try f catch { case ex: Exception if left > 1 => attempt(left - 1)(f) }

    LoadConfig.activeEntries(spark, configPath).map { e =>
      val start = new Timestamp(System.currentTimeMillis())
      try {
        val raw = attempt(maxAttempts)(source(e.tableName))
        val incremental = e.loadMode == "incremental" && e.watermarkColumn.isDefined
        val windowed = (for {
          wmCol <- e.watermarkColumn if incremental
          wm <- watermarks.get(e.tableName)
        } yield Incremental.after(raw, col(wmCol),
          lit(wm).cast(raw.schema(wmCol).dataType))).getOrElse(raw)
        val staged = transform.getOrElse(e.tableName, identity[DataFrame] _)(windowed)

        staged.write.mode(if (incremental) "append" else "overwrite")
          .parquet(s"$outDir/${e.tableName}")
        val rows = spark.read.parquet(s"$outDir/${e.tableName}").count()
        val newWm = e.watermarkColumn.flatMap(c => Audit.newWatermark(windowed, c))
          .orElse(watermarks.get(e.tableName)) // empty window: carry forward
        Audit.log(spark, auditDir, Audit.Run(runId, e.tableName, e.loadMode,
          e.watermarkColumn.getOrElse(""), newWm.orNull, rows, "succeeded",
          start, new Timestamp(System.currentTimeMillis())))
        LoadResult(e.tableName, e.loadMode, rows, "succeeded", newWm)
      } catch {
        case ex: Exception =>
          Audit.log(spark, auditDir, Audit.Run(runId, e.tableName, e.loadMode,
            e.watermarkColumn.getOrElse(""), watermarks.get(e.tableName).orNull,
            0L, "failed", start, new Timestamp(System.currentTimeMillis())))
          LoadResult(e.tableName, e.loadMode, 0L, "failed", None)
      }
    }
  }
}
