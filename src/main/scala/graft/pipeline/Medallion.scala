package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Quality, Star}

/** The reference's medallion shape (bronze → silver → gold) as one
  * composable API.
  *
  * Every silver notebook in the reference is the same five steps
  * (reference: 4_silver/silver_customers.py, silver_transactions.py, …):
  * union the per-bank drops, CDM-normalize, flag quarantine, dedup to the
  * latest row per business key, then SCD2-merge. Every gold notebook is:
  * filter silver to current+clean, project/rename, left-join FK enrichment
  * (reference: 5_gold/dim_customer.py, fact_transaction.py).
  *
  * [[silver]] and [[gold*]] encode those shapes once, as pure
  * DataFrame transforms — each pipeline is a single Catalyst plan, so
  * pushdown/pruning/broadcasts apply end-to-end with no materialization
  * between layers (the reference pays a Delta write per layer; a caller
  * here chooses where to persist via graft.sources.Sinks).
  */
object Medallion {

  /** Bronze → silver: harmonizing union + CDM + quarantine + keyed dedup.
    *
    * @param sources  per-source bronze frames (schemas may differ; missing
    *                 columns become nulls, as `unionByName` in the reference)
    * @param cdm      the CDM projection (casts/normalization/surrogate keys)
    * @param rules    quarantine rules (adds is_quarantined/quarantine_reason)
    * @param keys     business key for dedup
    * @param recency  dedup order — newest first, include a unique tiebreak
    */
  def silver(
      sources: Seq[DataFrame],
      cdm: DataFrame => DataFrame,
      rules: Seq[Quality.Rule],
      keys: Seq[String],
      recency: Seq[Column]): DataFrame =
    Dedup.latestPerKey(
      Quality.quarantine(cdm(sources.reduce(_.unionByName(_, allowMissingColumns = true))), rules),
      keys, recency)

  /** Silver → gold dimension: current + clean rows, stamped. */
  def goldDim(silverDf: DataFrame, refreshedAt: Column): DataFrame =
    Star.dim(silverDf, refreshedAt)

  /** Silver → gold fact: clean fact rows left-join-enriched with (small)
    * dimensions; each dim is broadcast.
    */
  def goldFact(
      factBase: DataFrame,
      dims: Seq[(DataFrame, Column, Seq[Column])],
      refreshedAt: Column): DataFrame =
    dims.foldLeft(factBase.filter(!col("is_quarantined"))) {
      case (acc, (dim, cond, cols)) => Star.enrich(acc, dim, cond, cols)
    }.withColumn("refreshed_at", refreshedAt)
}
