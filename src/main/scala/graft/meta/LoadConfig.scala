package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-driven load configuration.
  *
  * Mirrors the reference's config table
  * (reference: 2_bronze_ingestion_adf/configs/load_config.csv — columns
  * source_type, table_name, load_mode full|incremental, watermark_column, …):
  * the pipeline enumerates ACTIVE config rows and plans one load per row,
  * full loads as straight scans and incremental ones as watermark-predicate
  * scans ([[graft.ops.Incremental]]).
  */
object LoadConfig {

  final case class Entry(
      sourceType: String,
      tableName: String,
      isActive: Boolean,
      loadMode: String,
      watermarkColumn: Option[String])

  /** Read a load-config CSV (header row, reference column names). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col("source_type"), col("table_name"),
        (col("is_active") === "1").as("is_active"),
        col("load_mode"), col("watermark_column"))

  /** Active entries as typed config (small table — collected on the driver,
    * as ADF does when fanning out per-table copy activities).
    */
  def activeEntries(spark: SparkSession, path: String): Seq[Entry] =
    read(spark, path).filter(col("is_active")).collect().toSeq.map { r =>
      Entry(
        r.getString(0), r.getString(1), r.getBoolean(2), r.getString(3),
        Option(r.getString(4)).filter(_.nonEmpty))
    }
}
