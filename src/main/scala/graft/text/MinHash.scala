package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over word-bigram shingles.
  *
  * Portable construction (reproducible in the DuckDB oracle):
  *  - permutation i's hash of shingle s = hash60(i + "|" + s) (salted md5);
  *  - signature component i = min over the doc's shingle set;
  *  - LSH band value = SUM of the band's signature components — sum is
  *    order-independent and 4 × 60-bit values stay under 2^63.
  *
  * Performance shape (measured at sf0.1, 32 threads):
  *  - md5 is computed once per DISTINCT (shingle, salt) — the shingle
  *    vocabulary times k — and broadcast-joined to the (doc, shingle) pairs,
  *    instead of per occurrence (15k hashes vs 12M).
  *  - everything stays in explode/groupBy form: Spark's higher-order array
  *    functions (transform/aggregate) are interpreted, not codegen'd — an
  *    array-expression formulation of the same signature was ~10× slower.
  *  - the signature is `.cache()`d: three plan branches (bands, sig-sim a/b)
  *    reuse it, and uncached Spark would recompute the full subtree per
  *    branch. At cluster scale this is the standard persist-the-signatures
  *    step of any LSH pipeline.
  *  - exact-Jaccard verification uses `array_intersect` on the two shingle
  *    ARRAYS of each candidate pair — candidates only, no corpus-wide
  *    shingle shuffle.
  *
  * Band geometry is the skew lever: more rows per band (r↑) sharpens the
  * collision threshold (~ (1/b)^(1/r)) and shrinks buckets. On corpora with
  * a small shingle vocabulary, r=1 buckets degenerate (the globally minimal
  * shingle sits in most documents); r>=2 keeps buckets tiny (measured at
  * sf0.1: r=1 → 962k candidate pairs, r=2 → 24k).
  */
object MinHash {

  /** (id, shingles): distinct word-bigram shingle array per doc.
    *
    * The token array is BOUND to a column before the bigram lambda touches
    * it: `element_at(<expr>, i)` inside a `transform` re-evaluates the whole
    * expression per element, turning tokenization quadratic per document
    * (measured: 26s vs <1s at sf0.1 just to explode the shingles).
    */
  def withShingles(docs: DataFrame, id: String, text: String): DataFrame =
    docs.withColumn("_toks", TextFunctions.tokens(col(text)))
      .select(col(id),
        array_distinct(TextFunctions.wordBigrams(col("_toks"))).as("shingles"))

  /** (id, shingle) rows from the array form. `explode_outer` on purpose:
    * plain `explode` makes the optimizer infer a `size(...) > 0` filter and
    * push it below the projection with the whole shingle expression inlined
    * — recomputing tokenization per row in the scan filter.
    */
  def shingleRows(shingleDf: DataFrame, id: String): DataFrame =
    shingleDf.select(col(id), explode_outer(col("shingles")).as("shingle"))
      .filter(col("shingle").isNotNull)

  /** Salted-min signature rows (id, salt, minh), salt in [0, k).
    * Hashes the distinct shingle vocabulary once and broadcast-joins it.
    * Cached — callers branch over it several times.
    */
  def signature(shRows: DataFrame, id: String, k: Int): DataFrame = {
    val vocab = shRows.select(col("shingle")).distinct()
      .select(col("shingle"), explode(sequence(lit(0), lit(k - 1))).as("salt"))
      .withColumn("h", TextFunctions.hash60(concat_ws("|", col("salt"), col("shingle"))))
    shRows.join(broadcast(vocab), "shingle")
      .groupBy(col(id), col("salt"))
      .agg(min(col("h")).as("minh"))
      .cache()
  }

  /** (id, band, band_val) for bands of `rows` consecutive components. */
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

  /** Exact Jaccard for candidate pairs via array set ops (no shingle
    * explosion — only candidate docs' arrays are touched).
    */
  def jaccard(shingleDf: DataFrame, pairs: DataFrame, id: String): DataFrame =
    pairs
      .join(shingleDf.select(col(id).as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingleDf.select(col(id).as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared") * lit(1.0) / (size(col("sh_a")) + size(col("sh_b")) - col("shared")))
      .drop("sh_a", "sh_b")
}
