package graft.pipeline

import java.sql.Timestamp
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
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
  *
  * Each load is ONE pass over the data: the rows-written count and the new
  * watermark ride the write job as `observe()` (CollectMetrics) metrics —
  * no re-read of the just-written output, no second scan of the source for
  * the max. `rows` is the batch written THIS run (the reference's
  * per-activity rowsCopied — reference: pl_sql_copy_bronze.json
  * rows_processed), not the cumulative table size.
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

  /** Bounded wait on an Observation: its metrics only ever arrive if the
    * observed node was part of an executed plan — a `transform` that does
    * not derive its output from its input would otherwise hang `get`
    * forever. Timing out falls back to the separate-scan path.
    */
  private def getWithin(obs: Observation, timeout: FiniteDuration): Option[Map[String, Any]] = {
    import scala.concurrent.ExecutionContext.Implicits.global
    try Some(Await.result(Future(obs.get), timeout))
    catch { case _: java.util.concurrent.TimeoutException => None }
  }

  /** Run every active config entry: read via `source`, optionally window to
    * rows past the last watermark, apply the table's silver `transform`
    * (identity when absent), write parquet under `outDir/<table>`
    * (append for incremental loads, ATOMIC overwrite for full refreshes),
    * and audit the outcome. A failing table records a `failed` audit row
    * and does not stop the remaining tables.
    */
  def run(spark: SparkSession, configPath: String, outDir: String, auditDir: String,
      runId: String, source: String => DataFrame,
      transform: Map[String, DataFrame => DataFrame] = Map.empty,
      maxAttempts: Int = 1): Seq[LoadResult] = {
    val watermarks = lastWatermarks(spark, auditDir)

    // ADF-style per-activity retry. DataFrames are lazy, so transient
    // failures surface at the write ACTION — the whole read-window-
    // transform-write pass sits inside the attempt, with fresh
    // Observations per attempt (an Observation instance is single-use and
    // a failed job may deliver partial metrics).
    def attempt[T](left: Int)(f: => T): T =
      try f catch { case ex: Exception if left > 1 => attempt(left - 1)(f) }

    LoadConfig.activeEntries(spark, configPath).map { e =>
      val start = new Timestamp(System.currentTimeMillis())
      try {
        val incremental = e.loadMode == "incremental" && e.watermarkColumn.isDefined
        // Bootstrap-then-incremental (reference: pl_bootstrap.json +
        // bootstrap_load_config.csv): an incremental table with NO prior
        // watermark is a full bootstrap — written as an atomic OVERWRITE,
        // so re-running after a lost audit log rebuilds the table instead
        // of appending a duplicate copy. Steady-state windows append.
        val windowedLoad = incremental && watermarks.contains(e.tableName)
        val (rows, newWm) = attempt(maxAttempts) {
          val raw = source(e.tableName)
          val windowed = (for {
            wmCol <- e.watermarkColumn if incremental
            wm <- watermarks.get(e.tableName)
          } yield Incremental.after(raw, col(wmCol),
            lit(wm).cast(raw.schema(wmCol).dataType))).getOrElse(raw)
          // Watermark = max over the WINDOWED SOURCE rows (reference:
          // 1_audit/catch_new_watermark_value.py — the bronze max, before
          // any silver transform touches or drops the column).
          val wmObs = Observation()
          val observedSrc = e.watermarkColumn.fold(windowed)(c =>
            windowed.observe(wmObs, max(col(c)).as("wm")))
          val rowObs = Observation()
          val staged = transform.getOrElse(e.tableName, identity[DataFrame] _)(observedSrc)
            .observe(rowObs, count(lit(1)).as("rows"))

          val path = s"$outDir/${e.tableName}"
          if (windowedLoad) staged.write.mode("append").parquet(path)
          else graft.sources.Sinks.overwriteAtomic(staged, path)

          val rows = rowObs.get("rows").asInstanceOf[Long]
          val wm = e.watermarkColumn.flatMap { c =>
            getWithin(wmObs, 10.seconds) match {
              case Some(m) => Option(m("wm")).map(_.toString)
              case None    => Audit.newWatermark(windowed, c) // severed lineage
            }
          }.orElse(watermarks.get(e.tableName)) // empty window: carry forward
          (rows, wm)
        }
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
