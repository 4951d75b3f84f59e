package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** B-block: text-analysis + dedup-family operators (stub, filled next). */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame
  val defs: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
