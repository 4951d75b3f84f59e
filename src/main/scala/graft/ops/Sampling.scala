package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for corpus curation: keep a row iff
  * hash60(id) % 100 < rate(stratum). Reproducible across runs/engines
  * (unlike `df.sample`, which is seed- and partitioning-dependent), needs
  * no shuffle (pure filter, pushed past everything by Catalyst), and
  * supports per-stratum rates — the downsample-overrepresented-strata step
  * of a training-data mix.
  */
object Sampling {

  /** Per-stratum percentage sample. `rates` maps stratum value → keep %,
    * `defaultRate` applies to unlisted strata.
    */
  def stratified(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratumCol === k, lit(r)).otherwise(acc)
    }
    df.filter(Cdm.hash60(idCol.cast("string")) % 100 < rate)
  }
}
