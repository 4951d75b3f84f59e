package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** API-extract component — the engine-side analog of the reference's FX
  * feed (reference: 3_api_extracts/api_fx_rates.py: fetch ECB-style JSON
  * rates over HTTP, flatten to (currency, rate, date) rows, land parquet,
  * log rows_written; silver keeps the latest rate per currency).
  *
  * The FETCH is the caller's: this component takes already-retrieved
  * payload strings (from any HTTP client, a queue, or a file fixture —
  * the sandbox has no network and the parse/flatten/land logic is the
  * engine capability). Payload shape, one JSON document per snapshot:
  *
  * {{{ {"base":"EUR","as_of":"2024-01-05","rates":{"USD":1.09,"GBP":0.86}} }}}
  *
  * Scale: payloads are API-rate data (KBs per snapshot) — the parse is a
  * driver-local Dataset; the landed bronze accumulates over runs and the
  * latest-rate view is a keyed argmax (one shuffle on currency).
  */
object ApiExtract {

  /** Explicit payload schema — inference would cost an extra pass and
    * pins `rates` as a MAP so currencies stay data, not schema.
    */
  private val payloadSchema = StructType(Seq(
    StructField("base", StringType),
    StructField("as_of", StringType),
    StructField("rates", MapType(StringType, DoubleType))))

  /** Flatten payload documents to (base, rate_date, currency, rate) rows.
    * Malformed documents yield null fields rather than failing the batch
    * (the reference's extract skips bad snapshots).
    */
  def parseFx(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(payloadSchema).json(payloads.toDS())
      .select(col("base"), to_date(col("as_of")).as("rate_date"),
        explode(col("rates")).as(Seq("currency", "rate")))
      .filter(col("currency").isNotNull && col("rate").isNotNull)
  }

  /** Latest rate per (base, currency) — the silver view of the landed feed
    * (reference: 4_silver/silver_fx_rates.py latest-per-key).
    */
  def latestRates(parsed: DataFrame): DataFrame =
    graft.ops.Dedup.latestPerKey(parsed, Seq("base", "currency"),
      Seq(col("rate_date").desc))

  /** Parse `payloads` and append the flattened rows to the bronze
    * directory; returns rows_written (counted on the write pass itself —
    * the reference's extract logs the same figure per run).
    */
  def landFx(spark: SparkSession, payloads: Seq[String], bronzeDir: String): Long = {
    val obs = Observation()
    parseFx(spark, payloads).observe(obs, count(lit(1)).as("rows"))
      .write.mode("append").parquet(bronzeDir)
    obs.get("rows").asInstanceOf[Long]
  }
}
