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

  /** `mergeSchema` = schema evolution on read: reconcile column sets
    * across files written at different schema versions (the reference's
    * evolving bronze drops lean on unionByName + Delta schema merging).
    * Off by default — merging footers costs a pre-pass over file metadata.
    */
  def parquet(spark: SparkSession, path: String, mergeSchema: Boolean = false): DataFrame =
    (if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read)
      .parquet(path)

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

  /** JDBC table reader — the reference's PRIMARY bronze ingestion path
    * (reference: 2_bronze_ingestion_adf/datasets/generic_sql_ds.json +
    * linked_services/sql_ls.json: parameterized SQL-database copies over
    * two banks' schemas, 6_source_ddl/banq_a_ddl.sql).
    *
    * Filters applied to the returned frame — including the Runner's
    * incremental watermark predicate — are pushed INTO the database query
    * by Catalyst (JDBC relations support filter pushdown; `.explain` shows
    * them under PushedFilters), so an incremental load ships only the new
    * rows over the wire, which is the entire point of the reference's
    * `incremental_column` config.
    *
    * Pass `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` for
    * a parallel read (one DB cursor per partition) — a single-cursor read
    * of a large table serializes the whole extract through one connection.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty,
      partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
    partitioning.fold(base) { case (colName, lower, upper, n) =>
      base.option("partitionColumn", colName)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
    }.load()
  }

  /** `source` function for [[graft.pipeline.Runner.run]] backed by a JDBC
    * database: each config table name resolves to a pushdown-capable JDBC
    * scan — the Runner's watermark window then executes IN the database.
    */
  def jdbcSource(spark: SparkSession, url: String,
      options: Map[String, String] = Map.empty): String => DataFrame =
    table => jdbc(spark, url, table, options)
}
