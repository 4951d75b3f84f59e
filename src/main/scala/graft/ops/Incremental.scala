package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark-driven incremental loading.
  *
  * Reference: ADF pipelines pass the last watermark into each copy, and
  * `catch_new_watermark_value.py` computes `max(watermark_col)` after the load
  * (reference: 1_audit/catch_new_watermark_value.py:20-40,
  *  2_bronze_ingestion_adf/configs/load_config.csv `incremental_column`).
  *
  * The watermark comparison is a plain predicate so it pushes down to the
  * parquet/JDBC scan (`PushedFilters`) — at 100 TB the incremental window
  * reads only the matching row groups / partitions.
  */
object Incremental {

  /** Rows strictly after the given watermark value. */
  def after(df: DataFrame, watermarkCol: Column, watermark: Column): DataFrame =
    df.filter(watermarkCol > watermark)

  /** New watermark after a load: max of the watermark column (single-row agg;
    * the only "collect" in the pipeline, and it is one scalar).
    */
  def capture(df: DataFrame, watermarkCol: Column): DataFrame =
    df.agg(max(watermarkCol).as("new_watermark"))

  /** Relative watermark: rows within `interval` of the max — used when the
    * caller stores no external state (self-describing incremental window).
    * The scalar max is computed as a 1-row subplan and broadcast, not
    * collected on the driver.
    */
  def tail(df: DataFrame, watermarkCol: Column, interval: String): DataFrame = {
    val wm = df.agg((max(watermarkCol) - expr(s"INTERVAL $interval")).as("_graft_wm"))
    df.join(broadcast(wm)).filter(watermarkCol > col("_graft_wm")).drop("_graft_wm")
  }
}
