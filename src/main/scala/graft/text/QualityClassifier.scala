package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier (q100): logistic regression over
  * HASHED n-gram features — the DCLM/FineWeb-Edu-lineage curation move
  * (public methodology: fastText-style linear text classification,
  * Joulin et al. 2016, with the hashing trick, Weinberger et al. 2009).
  * q24/q89 are FIXED heuristics; this is the learned face: label a few
  * thousand docs (or distill labels from a stronger model), train, score
  * the corpus, gate on the logit.
  *
  * Split of labor for 100 TB (the q95 BPE-training discipline):
  *  - FEATURIZE is scan-shaped: tokens + word bigrams → portable hash60
  *    bucket mod `dim` → per-(doc, bucket) counts. One explode + one
  *    map-side-combined agg; `dim` bounds everything downstream.
  *  - TRAIN is a driver loop over epochs; each epoch's gradient is ONE
  *    map-side-combined aggregation (features ⋈ broadcast weights →
  *    per-doc logit → residual → per-bucket Σ count·residual), collected
  *    at `dim` rows — bounded whatever the corpus size. Deterministic
  *    init (zeros); labeled sets are small by nature, so epochs are cheap
  *    and the feature frame caches once ([[graft.Graft.registerCache]]).
  *  - SCORE is a pure projection-and-agg under fixed weights — the
  *    oracle-checkable face. Under the q100 oracle's closed-form DYADIC
  *    weights (w(b) = ((b mod 17) − 8)/16) every per-gram term is an
  *    exact small multiple of 1/16, so the per-doc double sum is EXACT
  *    and order-independent — the DuckDB compare is bit-stable with no
  *    rounding seam.
  *
  * Reference lineage: the quarantine DQ gate
  * (4_silver/silver_transactions.py:95-103) with the rule LEARNED from
  * labels instead of hand-written.
  */
object QualityClassifier {

  /** Hashed-feature frame: (idCol, bucket, cnt) — unigrams + word bigrams,
    * bucket = hash60(gram) mod `dim` (md5-prefix construction, so DuckDB
    * reproduces it verbatim). One explode, one map-side-combined count.
    */
  def features(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    // widen: per-doc tokenize+gram hashing before the first exchange
    // (no-op at scale and on streaming inputs — Sources.widen checks).
    graft.sources.Sources.widen(docs, col(idCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        // explode_outer + null filter (the MinHash.shingleRows dodge):
        // plain explode infers a size()>0 filter rebuilding the
        // unigram+bigram concat per doc in an interpreted Filter.
        explode_outer(concat(col("_toks"), TextFunctions.wordBigrams(col("_toks")))).as("gram"))
      .filter(col("gram").isNotNull)
      .select(col(idCol), (TextFunctions.hash60(col("gram")) % dim).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The q100 oracle's closed-form weight table: (bucket, w) for
    * 0 ≤ bucket < dim with w = ((bucket mod 17) − 8)/16 — deterministic,
    * dyadic (exact in double), and reproducible in one SQL expression.
    */
  def formulaWeights(spark: SparkSession, dim: Int): DataFrame =
    spark.range(dim).select(col("id").as("bucket"),
      ((col("id") % 17) - 8).cast("double").divide(16.0).as("w"))

  /** Array spelling of a (bucket, w) weights frame (driver-side, for the
    * training loop's broadcast-as-literal join and for inspection).
    */
  def weightsArray(weights: DataFrame, dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    weights.select(col("bucket").cast("int"), col("w").cast("double"))
      .collect().foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }

  private def weightsDf(spark: SparkSession, w: Array[Double]): DataFrame = {
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toDF("bucket", "w")
  }

  /** Score every document under FIXED weights: (idCol, logit, pass) with
    * logit = Σ_buckets count·w and pass = logit > 0. Docs with no tokens
    * score 0 (kept: the gate's default-deny/allow is the caller's call).
    * The weights side broadcasts (`dim` rows); one shuffle (the per-doc
    * agg) — scan-shaped at any corpus size.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int): DataFrame = {
    val scored = features(docs, idCol, textCol, dim)
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("w")).as("_logit"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_logit"), lit(0.0)).as("logit"),
        (coalesce(col("_logit"), lit(0.0)) > 0.0).as("pass"))
  }

  /** Convenience: score under a driver-side weight array. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double]): DataFrame =
    score(docs, idCol, textCol, weightsDf(docs.sparkSession, weights), weights.length)

  /** Train logistic-regression weights from labeled docs (`labelCol` ∈
    * {0, 1}). Full-batch gradient ascent on the log-likelihood: per epoch,
    * residual = label − σ(logit) per doc, gradient_b = Σ_docs
    * count_b·residual — ONE map-side-combined agg collected at `dim`
    * rows; the driver applies w += lr·grad/n. Deterministic zero init;
    * the feature frame is registered-cached across epochs (bounded:
    * labeled training sets are small by construction — this is the q95
    * driver-loop discipline, not a distributed optimizer).
    */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 1 << 12, epochs: Int = 20, lr: Double = 1.0): Array[Double] = {
    val spark = docs.sparkSession
    val feats = graft.Graft.registerCache(
      features(docs, idCol, textCol, dim)
        .join(docs.select(col(idCol), col(labelCol).cast("double").as("_y")), idCol))
    val n = math.max(1L, docs.count())
    val w = new Array[Double](dim)
    var e = 0
    while (e < epochs) {
      val grads = feats
        .join(broadcast(weightsDf(spark, w)), "bucket")
        .groupBy(col(idCol), col("_y"))
        .agg(sum(col("cnt") * col("w")).as("_logit"),
          // carry this doc's (bucket, cnt) list through the per-doc agg so
          // the residual fans back out without a second join
          collect_list(struct(col("bucket"), col("cnt"))).as("_bc"))
        .select(explode(col("_bc")).as("_f"),
          (col("_y") - lit(1.0) / (lit(1.0) + exp(-col("_logit")))).as("_res"))
        .groupBy(col("_f.bucket").as("bucket"))
        .agg(sum(col("_f.cnt") * col("_res")).as("g"))
        .collect()
      grads.foreach { r =>
        w(r.getLong(0).toInt) += lr * r.getDouble(1) / n
      }
      e += 1
    }
    w
  }
}
