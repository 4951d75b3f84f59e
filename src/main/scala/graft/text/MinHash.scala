package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over word-bigram shingles.
  *
  * Portable construction (reproducible in the DuckDB oracle):
  *  - permutation i's hash of shingle s = hash60(i + "|" + s) (salted md5);
  *  - signature component i = min over the doc's shingles;
  *  - LSH band value = SUM of the band's signature components — sum is
  *    order-independent, so no sorted-collect is needed, and 4 × 60-bit
  *    values stay under 2^63.
  *
  * Scale: candidate generation is an equi-join on (band, band_value) — one
  * shuffle keyed by band value, never a quadratic cross join. True-Jaccard
  * verification then runs only on the candidate set.
  */
object MinHash {

  /** Distinct word-bigram shingles: (id, shingle). */
  def shingleSet(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
        explode(array_distinct(TextFunctions.wordBigrams(TextFunctions.tokens(col(text))))).as("shingle"))
      .distinct()

  /** Salted-min signature: (id, salt, minh) for salt in [0, k). */
  def signature(shingles: DataFrame, id: String, k: Int): DataFrame =
    shingles
      .select(col(id), explode(sequence(lit(0), lit(k - 1))).as("salt"), col("shingle"))
      .groupBy(col(id), col("salt"))
      .agg(min(TextFunctions.hash60(concat_ws("|", col("salt"), col("shingle")))).as("minh"))

  /** LSH bands of `rows` signature components: (id, band, band_val). */
  def bands(sig: DataFrame, id: String, rows: Int): DataFrame =
    sig.groupBy(col(id), expr(s"salt div $rows").as("band"))
      .agg(sum(col("minh")).as("band_val"))

  /** Distinct candidate pairs (id_a < id_b) sharing any band value. */
  def candidates(bandsDf: DataFrame, id: String): DataFrame = {
    val a = bandsDf.select(col("band"), col("band_val"), col(id).as("id_a"))
    val b = bandsDf.select(col("band"), col("band_val"), col(id).as("id_b"))
    a.join(b, Seq("band", "band_val")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard over the shingle sets for given candidate pairs. */
  def jaccard(shingles: DataFrame, pairs: DataFrame, id: String): DataFrame = {
    val counts = shingles.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val shared = pairs
      .join(shingles.select(col(id).as("id_a"), col("shingle")), "id_a")
      .join(shingles.select(col(id).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    shared
      .join(counts.select(col(id).as("id_a"), col("n").as("n_a")), "id_a")
      .join(counts.select(col(id).as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard", col("shared") * lit(1.0) / (col("n_a") + col("n_b") - col("shared")))
  }
}
