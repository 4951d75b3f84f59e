package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term-frequency-weighted 60-bit SimHash near-duplicate detection.
  *
  * Token hash = portable hash60; bit j of the fingerprint is set when the
  * tf-weighted sum of sign(bit j of token hash) is positive. Candidate pairs
  * share at least one 10-bit band of the fingerprint (6 bands); they are then
  * verified by exact Hamming distance (`bit_count(a ^ b)`).
  *
  * tf-weighting matters on skewed corpora: with a small vocabulary, distinct
  * token SETS nearly coincide across documents and an unweighted simhash
  * collapses to a few values; the tf vector still discriminates.
  *
  * Scale: fingerprint build is a (doc, token) aggregation + a (doc, bit)
  * aggregation; candidates are an equi-join on (band, value). No cross join.
  */
object SimHash {

  /** (id, simhash) 60-bit fingerprints. Explode/groupBy form on purpose:
    * higher-order array functions are interpreted (no codegen) and measured
    * ~20× slower here. The token hash is computed once per DISTINCT token
    * (broadcast-joined), not per occurrence.
    */
  def fingerprints(docs: DataFrame, id: String, text: String): DataFrame = {
    val tf = docs
      .select(col(id), explode(TextFunctions.tokens(col(text))).as("tok"))
      .groupBy(col(id), col("tok")).agg(count(lit(1)).as("tf"))
    val vocab = tf.select(col("tok")).distinct()
      .withColumn("h", TextFunctions.hash60(col("tok")))
    tf.join(broadcast(vocab), "tok")
      .select(col(id), col("tf"), col("h"), explode(sequence(lit(0), lit(59))).as("j"))
      .groupBy(col(id), col("j"))
      .agg(sum((expr("(h >> j) & 1") * 2 - 1) * col("tf")).as("s"))
      .groupBy(col(id))
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), j)")).otherwise(lit(0L)))
        .as("simhash"))
  }

  /** Pairs within `maxHamming` of each other, found via 6 × 10-bit bands. */
  def nearPairs(fp: DataFrame, id: String, maxHamming: Int): DataFrame = {
    val banded = fp.select(col(id), col("simhash"),
      explode(sequence(lit(0), lit(5))).as("band"))
      .withColumn("band_val", expr("(simhash >> (band * 10)) & 1023"))
    val a = banded.select(col("band"), col("band_val"), col(id).as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_val"), col(id).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "band_val")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b")).distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
