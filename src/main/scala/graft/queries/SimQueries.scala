package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** B-block: embedding similarity / ANN operators (stub, filled next). */
object SimQueries {
  type Q = (SparkSession, String) => DataFrame
  val defs: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
