package graft.meta

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Incremental

/** Run-audit records: one row per load with run id, load mode, watermark and
  * status (reference: 1_audit/audit_ddl.sql `audit_logs`,
  * 1_audit/audit_start.py / audit_end.py, and
  * catch_new_watermark_value.py for the post-load watermark capture).
  *
  * Stored as an append-only parquet log. At scale this is a tiny
  * metadata-rate table — one row per pipeline run, not per data row.
  */
object Audit {

  final case class Run(
      run_id: String,
      source_system: String,
      source_object: String,
      load_mode: String,
      watermark_column: String,
      watermark_value: String,
      rows_processed: Long,
      status: String,
      start_time: Timestamp,
      end_time: Timestamp)

  /** Append one run record to the audit log directory.
    *
    * Synchronized: the Runner's parallel table dispatch appends from
    * several driver threads, and concurrent `append` writes into ONE
    * directory race on the shared `_temporary` committer workspace. The
    * JVM-local lock serializes the (tiny, one-row) writes; multiple
    * concurrent DRIVERS would need a transactional log (Delta/Iceberg)
    * instead, which is what the reference's audit DB gives it.
    */
  def log(spark: SparkSession, auditDir: String, run: Run): Unit = this.synchronized {
    import spark.implicits._
    Seq(run).toDS().write.mode("append").parquet(auditDir)
  }

  /** New watermark after a load: stringified max of the watermark column,
    * None when the frame is empty or all-null
    * (reference: 1_audit/catch_new_watermark_value.py:30-45).
    */
  def newWatermark(df: DataFrame, watermarkColumn: String): Option[String] = {
    val row = Incremental.capture(df, col(watermarkColumn)).collect()(0)
    if (row.isNullAt(0)) None else Some(row.get(0).toString)
  }

  /** Latest status per (source_system, source_object) from the audit log
    * (window dedup). Keyed by BOTH, as the reference's watermark fetch is
    * (reference: 1_audit/fetch_logs.py:23-27 filters on source_system AND
    * source_object) — two systems landing same-named tables carry
    * independent watermarks.
    *
    * A load writes a `running` row at START and a terminal row at end
    * (reference: 1_audit/audit_start.py / audit_end.py) — so a load whose
    * JVM died mid-write is VISIBLE here as `running` (vs "never ran").
    * The end_time-desc order prefers the terminal row of a completed run;
    * on an exact end_time tie (sub-millisecond load) the terminal row
    * still wins via the status-priority tiebreak.
    */
  def latestRuns(spark: SparkSession, auditDir: String): DataFrame =
    graft.ops.Dedup.latestPerKey(
      spark.read.parquet(auditDir),
      Seq("source_system", "source_object"),
      Seq(col("end_time").desc,
        when(col("status") === "running", 0).otherwise(1).desc,
        col("run_id").desc))

  /** Latest COMPLETED run per key: `running` rows are crash/in-flight
    * markers, not outcomes — watermark carry-forward must read through
    * them to the last terminal row, never treat them as state.
    */
  def latestCompletedRuns(spark: SparkSession, auditDir: String): DataFrame =
    graft.ops.Dedup.latestPerKey(
      spark.read.parquet(auditDir).filter(col("status") =!= "running"),
      Seq("source_system", "source_object"),
      Seq(col("end_time").desc, col("run_id").desc))
}
