package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one-and-only Spark-internal seam graft uses: a DSv1 streaming
  * `Source.getBatch` must return a DataFrame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor for such a frame — `internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` — is `private[sql]`. This shim lives in the
  * `org.apache.spark.sql` namespace purely to reach it at compile time,
  * the standard public-connector pattern for DSv1 sources (Spark's own
  * FileStreamSource builds its batches exactly this way). No other Spark
  * internals are touched; everything else in graft is public API.
  */
object StreamShim {

  /** Re-plan `df` (a finished batch read) as a streaming-tagged frame:
    * the batch plan's rows become the micro-batch's input relation.
    */
  def asStreamingFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
