package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer star schema builders.
  *
  * Reference: dims are full refreshes of current+clean silver rows
  * (reference: 5_gold/dim_customer.py:44-58), facts are the silver base
  * filtered to current+clean then LEFT-join enriched through the FK chain
  * (reference: 5_gold/fact_transaction.py:63-95,
  *  5_gold/fact_settlement.py:50-80).
  *
  * Scale: every dim side is wrapped in `broadcast()` — at 100 TB the fact
  * table never shuffles for enrichment; each executor streams its fact
  * partitions against in-memory dim hash maps. Dims too big to broadcast
  * should be bucketed on the join key instead (see §5 of SURVEY.md).
  */
object Star {

  /** Dim build: keep current + non-quarantined rows, stamp `refreshed_at`. */
  def dim(silver: DataFrame, refreshedAt: Column): DataFrame =
    silver
      .filter(col("is_current") && !col("is_quarantined"))
      .withColumn("refreshed_at", refreshedAt)

  /** Left-join the fact to a (small) dimension on `cond`, broadcasting the
    * dim. `dimCols` selects/aliases what the fact should absorb.
    */
  def enrich(fact: DataFrame, dim: DataFrame, cond: Column, dimCols: Seq[Column]): DataFrame =
    fact.join(broadcast(dim.select(dimCols: _*)), cond, "left")
}
