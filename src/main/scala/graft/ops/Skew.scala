package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join splitting (on by default in the bench/verify sessions)
  * covers sort-merge joins; these helpers cover the aggregation side, where
  * one hot business key (a viral document, a mega-merchant) would otherwise
  * pin a single reducer at 100 TB.
  *
  * Pattern: two-phase aggregation — salt the key into `buckets` subkeys,
  * pre-aggregate per (key, salt), then merge the partials per key. Both
  * phases are map-side-combinable groupBys; the second operates on
  * `buckets` rows per key at most.
  */
object Skew {

  /** Adds a deterministic salt column in [0, buckets) derived from a
    * distributor column (a unique id beats rand(): reproducible and evenly
    * spread).
    */
  def salted(df: DataFrame, distributor: Column, buckets: Int, as: String = "_salt"): DataFrame =
    df.withColumn(as, pmod(hash(distributor), lit(buckets)))

  /** Two-phase skew-safe sum: sum `value` per `keys` via salted partials. */
  def skewSafeSum(df: DataFrame, keys: Seq[String], distributor: Column, value: Column,
      as: String, buckets: Int = 64): DataFrame =
    salted(df, distributor, buckets)
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(value).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(as))
}
