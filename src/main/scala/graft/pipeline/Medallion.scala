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

  /** The medallion riding the i23 transaction log (r18) — the persisted
    * spelling the reference actually runs (each layer a Delta table):
    * [[silver]]'s staged batch SCD2-merges ROW-LEVEL into a versioned
    * silver table ([[graft.ops.Scd2.mergeVersioned]] — only files holding
    * changed keys rewrite, the reference's two MERGE INTOs,
    * 4_silver/silver_transactions.py:124,153), and the gold hop consumes
    * the silver COMMIT LOG exactly-once via
    * [[graft.sources.VersionedTable.feedInto]] (its txn progress lives in
    * gold's own log — the silver→gold streaming-Delta read). Pass the same
    * (`app`,`batch`) per micro-batch for replay idempotence. Both tables
    * must exist (the notebooks' ensure-table DDL step).
    *
    * Returns (silver version committed (None = batch was a no-op or a
    * replay), gold hop result from feedInto).
    */
  def runVersioned(
      spark: org.apache.spark.sql.SparkSession,
      sources: Seq[DataFrame],
      cdm: DataFrame => DataFrame,
      rules: Seq[Quality.Rule],
      keys: Seq[String],
      recency: Seq[Column],
      attrs: Seq[String],
      silverTable: String,
      goldTable: String,
      goldTransform: DataFrame => DataFrame,
      asOf: Column,
      app: String,
      batch: Long): (Option[Long], Option[(Long, Long)]) =
    runVersionedWith(spark, sources, cdm, rules, keys, recency, attrs,
      silverTable, asOf, app, batch)(
      graft.sources.VersionedTable.feedInto(
        spark, silverTable, goldTable, s"$app-gold")(goldTransform))

  /** The shared silver leg of both versioned medallion faces: stage,
    * quarantine-filter, SCD2 row-level merge — then run the caller's gold
    * hop (append-face or CDF-face).
    */
  private def runVersionedWith(
      spark: org.apache.spark.sql.SparkSession,
      sources: Seq[DataFrame],
      cdm: DataFrame => DataFrame,
      rules: Seq[Quality.Rule],
      keys: Seq[String],
      recency: Seq[Column],
      attrs: Seq[String],
      silverTable: String,
      asOf: Column,
      app: String,
      batch: Long)(goldHop: => Option[(Long, Long)]): (Option[Long], Option[(Long, Long)]) = {
    val staged = silver(sources, cdm, rules, keys, recency)
      .filter(!col("is_quarantined"))
      .select((keys ++ attrs).map(col): _*)
    val sv = graft.ops.Scd2.mergeVersioned(
      spark, silverTable, staged, keys, attrs, asOf, app, batch)
    (sv, goldHop)
  }

  /** [[runVersioned]] surviving row-level DML on silver (r19, i29): the
    * gold hop rides [[graft.sources.VersionedTable.feedChangesInto]], so
    * `goldTransform` receives the CDF frame (silver columns plus
    * `_change_type` ∈ {insert, update_preimage, update_postimage, delete}
    * and `_commit_version`) and the pipeline keeps flowing the day silver
    * takes a GDPR DELETE or an UPDATE — exactly where [[runVersioned]]'s
    * append-only hop fails named. The silver table must have its change
    * feed ON (`create(..., changeFeed = true)` / `enableChangeFeed`).
    * A typical additive gold appends SIGNED deltas: +measure for
    * insert/update_postimage, −measure for delete/update_preimage, and
    * aggregates at read — recompute-free incremental maintenance.
    */
  def runVersionedCdf(
      spark: org.apache.spark.sql.SparkSession,
      sources: Seq[DataFrame],
      cdm: DataFrame => DataFrame,
      rules: Seq[Quality.Rule],
      keys: Seq[String],
      recency: Seq[Column],
      attrs: Seq[String],
      silverTable: String,
      goldTable: String,
      goldTransform: DataFrame => DataFrame,
      asOf: Column,
      app: String,
      batch: Long): (Option[Long], Option[(Long, Long)]) =
    runVersionedWith(spark, sources, cdm, rules, keys, recency, attrs,
      silverTable, asOf, app, batch)(
      graft.sources.VersionedTable.feedChangesInto(
        spark, silverTable, goldTable, s"$app-gold")(goldTransform))
}
