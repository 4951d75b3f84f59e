package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Sinks, Sources}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("csv reader honors an explicit schema (no inference scan)") {
    val dir = tmp("csv")
    Files.write(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,amt\n1,1.5\n2,2.5\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amt", DoubleType)))
    val df = Sources.csv(spark, s"$dir/data.csv", Some(schema))
    assert(df.schema == schema)
    assert(df.as[(Long, Double)].collect().sorted.toSeq == Seq((1L, 1.5), (2L, 2.5)))
  }

  test("orc round-trips and pushes filters to the scan") {
    val dir = tmp("orc")
    Sinks.orc((1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v"), s"$dir/t")
    val back = Sources.orc(spark, s"$dir/t").filter(col("id") > 90)
    assert(back.count() == 10)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90"), plan)
  }

  test("dynamicOverwrite replaces only the partitions present in the batch") {
    val dir = tmp("dynpart")
    val day1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("dt", "v")
    Sinks.overwrite(day1, s"$dir/t", Seq("dt"))
    // restate only 01-02; 01-01 must survive
    val restate = Seq(("2024-01-02", 99L)).toDF("dt", "v")
    Sinks.dynamicOverwrite(restate, s"$dir/t", Seq("dt"))
    val out = spark.read.parquet(s"$dir/t").select("dt", "v")
      .as[(String, Long)].collect().sorted.toSeq
    assert(out == Seq(("2024-01-01", 1L), ("2024-01-02", 99L)))
  }

  test("json reader with schema reads nested props") {
    val dir = tmp("json")
    Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      "{\"id\":1,\"props\":{\"k\":5}}\n{\"id\":2,\"props\":{\"k\":7}}\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("props", StructType(Seq(StructField("k", IntegerType))))))
    val df = Sources.json(spark, s"$dir/d.json", Some(schema))
    assert(df.select(col("id"), col("props.k")).as[(Long, Int)].collect().sorted.toSeq
      == Seq((1L, 5), (2L, 7)))
  }
}
