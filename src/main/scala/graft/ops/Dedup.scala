package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication operators.
  *
  * Reference semantics: "if multiple files contain the same transaction, keep
  * the latest" (reference: 4_silver/silver_transactions.py:108-118 — window
  * `row_number` per business key ordered by recency desc) and the FX-rates
  * "one row per currency for the latest observation"
  * (reference: 4_silver/silver_fx_rates.py:68-71).
  *
  * Scale: one hash shuffle on the business key; the rank + filter run inside
  * each partition with no further exchange. At 100 TB the key is high-
  * cardinality (transaction id), so partitions stay balanced; skewed keys are
  * handled by AQE or [[Skew.salted]].
  */
object Dedup {

  /** Keep exactly one row per key: the first under `order` (ties must be
    * broken by the caller including a unique column in `order`).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
  }

  /** Exact duplicate removal by a derived fingerprint column: keeps the row
    * with the minimal `keepBy` per fingerprint. Used for exact text dedup
    * (fingerprint = md5 of normalized text).
    */
  def exactByFingerprint(df: DataFrame, fingerprint: Column, keepBy: Column): DataFrame =
    latestPerKey(df.withColumn("_graft_fp", fingerprint), Seq("_graft_fp"), Seq(keepBy.asc))
      .drop("_graft_fp")
}
