package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quarantine-flow data quality: rows failing validation are flagged (and can
  * be routed), never dropped silently and never fail the pipeline
  * (reference: 4_silver/silver_transactions.py:96-107 `is_quarantined`,
  *  README "Invalid or malformed records are redirected to a quarantine flow").
  *
  * Rules are named `Column` predicates → the whole check is one codegen'd
  * projection, no UDFs, no extra pass over the data.
  */
object Quality {

  final case class Rule(name: String, failed: Column)

  /** Null-or-blank check used throughout the reference's silver layer. */
  def nullOrBlank(c: Column): Column = c.isNull || length(trim(c)) === 0

  /** Adds `is_quarantined` (any rule failed) and `quarantine_reason`
    * (';'-joined failed rule names, null when clean).
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val reason = concat_ws(";", rules.map(r => when(r.failed, lit(r.name))): _*)
    df.withColumn("is_quarantined", rules.map(_.failed).reduce(_ || _))
      .withColumn("quarantine_reason", when(length(reason) === 0, lit(null)).otherwise(reason))
  }

  /** Split into (clean, quarantined). Both sides derive from one plan; Spark
    * reuses the scan via the shared subplan.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = quarantine(df, rules)
    (flagged.filter(!col("is_quarantined")), flagged.filter(col("is_quarantined")))
  }
}
