package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata layout (TESTDATA.md):
  * one parquet folder per table under an sf directory.
  *
  * Mirrors the reference's bronze readers
  * (reference: 4_silver/silver_transactions.py:58 `spark.read.format("parquet").load(glob)`),
  * but with column pruning pushed to the scan by construction — every
  * query selects the minimal column set so parquet `ReadSchema` stays narrow.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` encoding has varied across testdata generations:
    * TIMESTAMP(NANOS) (readable only as a raw long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by Verify/Bench/tests;
    * data is µs-aligned so `div 1000` converts losslessly) and plain
    * `timestamp[us]` without tz metadata, which Spark 4 infers as
    * TIMESTAMP_NTZ. The NTZ read is passed through untouched — the DuckDB
    * oracle reads the same file as a naive TIMESTAMP, so NTZ is the
    * parity-preserving type; consumers needing instant-typed functions
    * (e.g. unix_micros) cast locally, value-preserving under the UTC
    * session tz.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
