package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the gold-layer star aggregation (broadcast dims, one shuffle).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_star_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.SimQueries.defs ++
      graft.queries.ExtQueries.defs

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.SimQueries.oracle ++
      graft.queries.ExtQueries.oracle
}
