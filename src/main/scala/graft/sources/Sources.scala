package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (i03): explicit-schema batch + streaming readers.
  *
  * Always pass a schema where one is known: schema inference costs an extra
  * full scan of 100 TB; an explicit schema costs nothing and pins types.
  * Column pruning and filter pushdown then happen in the queries themselves
  * (verified by the plan specs).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** Columnar ORC reader (same pushdown/pruning properties as parquet —
    * the format some upstream warehouses hand over).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** File-based stream: new files under `path` become micro-batches
    * (the bronze "incremental drops" pattern,
    * reference: 4_silver/silver_transactions.py:58 glob reads — but as a
    * continuous stream instead of per-run globs).
    */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)
}
