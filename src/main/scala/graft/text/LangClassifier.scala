package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable multiclass language identifier (q104): softmax regression
  * over HASHED character trigrams — the learned face of q23's stopword
  * heuristic (public methodology: fastText-style linear text
  * classification, Joulin et al. 2016, whose langid variant is the
  * de-facto standard crawl-pipeline component; char n-grams rather than
  * words so it works on unsegmented scripts and misspellings).
  *
  * The q100 split of labor, widened to K classes:
  *  - FEATURIZE: normalize → char trigrams → portable hash60 bucket mod
  *    `dim` → per-(doc, bucket) counts. One explode + one map-side-
  *    combined agg, identical cost shape to [[QualityClassifier]].
  *  - SCORE under FIXED (lang, bucket, w) weights: per-(doc, class)
  *    logit = Σ count·w (the weights side broadcasts at K·dim rows),
  *    argmax via ONE max-struct aggregation — logit DESC, class index
  *    ASC on ties, never a per-doc window. The q104 oracle pins this
  *    face under closed-form DYADIC weights
  *    w(ci, b) = (((b + 31·ci) mod 17) − 8)/16 — every per-gram term an
  *    exact multiple of 1/16, so per-class sums are exact and the argmax
  *    is deterministic (bit-stable DuckDB compare).
  *  - TRAIN: full-batch softmax gradient ascent, driver loop; per epoch
  *    one aggregation computes per-(doc, class) logits, a numerically
  *    stable softmax (max-shifted) turns them into residuals
  *    y_c − p_c, and a join-back against the cached feature frame sums
  *    count·residual per (class, bucket) — collected at K·dim rows,
  *    bounded whatever the corpus size. Deterministic zero init.
  */
object LangClassifier {

  /** Hashed char-trigram feature frame: (idCol, bucket, cnt). Rides the
    * NATIVE gram-hash stream ([[TextFunctions.gramHashes]] — one codegen
    * call per document) rather than a per-gram md5 expression: identical
    * hash60 values (q66's parity-pinned expression), ~3× the scoring
    * throughput at sf0.1.
    */
  def features(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    // widen: per-doc character-gram hashing before the first exchange
    // (no-op at scale and on streaming inputs — Sources.widen checks).
    graft.sources.Sources.widen(docs, col(idCol))
      .select(col(idCol),
        // explode_outer + null filter (the MinHash.shingleRows dodge):
        // plain explode infers an interpreted size()>0 filter re-running
        // the per-character gram hashing per doc.
        explode_outer(TextFunctions.gramHashes(col(textCol), 3)).as("h"))
      .filter(col("h").isNotNull)
      .select(col(idCol), (col("h") % dim).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The q104 oracle's closed-form weight table: (lang, ci, bucket, w)
    * over the SORTED class list, w = (((bucket + 31·ci) mod 17) − 8)/16
    * — per-class phase shift so classes disagree, dyadic so sums are
    * exact, reproducible in one SQL expression.
    */
  def formulaWeights(spark: SparkSession, classes: Seq[String], dim: Int): DataFrame = {
    import spark.implicits._
    // built driver-side (K·dim rows — a dim table): a crossJoin spelling
    // would plant a BroadcastNestedLoopJoin in every scoring plan
    classes.sorted.zipWithIndex.flatMap { case (lang, ci) =>
      (0 until dim).map(b =>
        (lang, ci, b.toLong, (((b + 31 * ci) % 17) - 8) / 16.0))
    }.toDF("lang", "ci", "bucket", "w")
  }

  /** Predict every document's language under FIXED (lang, ci, bucket, w)
    * weights: (idCol, pred_lang, logit). A doc with no features predicts
    * the smallest class with logit 0 (the argmax of an all-zero vector
    * under the ci-ASC tiebreak).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int): DataFrame = {
    val defaultLang = weights.agg(min(col("lang"))).collect()(0).getString(0)
    val best = features(docs, idCol, textCol, dim)
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol), col("lang"), col("ci"))
      .agg(sum(col("cnt") * col("w")).as("logit"))
      .groupBy(col(idCol))
      .agg(max(struct(col("logit"), (-col("ci")).as("nci"), col("lang"))).as("k"))
      .select(col(idCol), col("k.lang").as("pred_lang"), col("k.logit").as("logit"))
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("pred_lang"), lit(defaultLang)).as("pred_lang"),
        coalesce(col("logit"), lit(0.0)).as("logit"))
  }

  /** Train softmax weights from labeled docs (`labelCol` holds the lang
    * string). Returns the (lang, ci, bucket, w) frame [[score]] takes —
    * classes are the sorted distinct labels. The q95/q100 driver-loop
    * discipline: one bounded aggregation per epoch, zero init, labeled
    * sets are small by construction.
    */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 1 << 12, epochs: Int = 20, lr: Double = 1.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val classes = docs.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val ciOf = classes.zipWithIndex.toMap
    val k = classes.length
    val labeled = docs.select(col(idCol),
      udfFreeClassIndex(col(labelCol), ciOf).as("_yci"))
    val feats = graft.Graft.registerCache(
      features(docs, idCol, textCol, dim).join(labeled, idCol))
    val n = math.max(1L, docs.count())
    val w = Array.fill(k)(new Array[Double](dim))
    def wDf: DataFrame =
      w.zipWithIndex.flatMap { case (row, ci) =>
        row.zipWithIndex.map { case (v, b) => (ci, b.toLong, v) }
      }.toSeq.toDF("ci", "bucket", "w")
    var e = 0
    while (e < epochs) {
      val grads = feats
        .join(broadcast(wDf), "bucket")
        .groupBy(col(idCol), col("_yci"), col("ci"))
        .agg(sum(col("cnt") * col("w")).as("logit"))
        .groupBy(col(idCol), col("_yci"))
        .agg(collect_list(struct(col("ci"), col("logit"))).as("_cl"))
        // stable softmax residuals per class: y_c − exp(l_c − mx)/Σexp
        // (explode_outer + null filter: the shingleRows dodge — plain
        // explode would re-run the softmax transform per doc in an
        // interpreted inferred filter)
        .select(col(idCol), explode_outer(expr(
          """transform(_cl, x -> named_struct(
            |  'ci', x.ci,
            |  'res', (CASE WHEN x.ci = _yci THEN 1.0d ELSE 0.0d END) -
            |    exp(x.logit - array_max(transform(_cl, y -> y.logit))) /
            |    aggregate(transform(_cl, y ->
            |      exp(y.logit - array_max(transform(_cl, z -> z.logit)))),
            |      0.0d, (a, v) -> a + v)))""".stripMargin)).as("_r"))
        .filter(col("_r").isNotNull)
        .select(col(idCol), col("_r.ci").as("ci"), col("_r.res").as("res"))
        .join(feats.select(col(idCol), col("bucket"), col("cnt")), idCol)
        .groupBy(col("ci"), col("bucket"))
        .agg(sum(col("cnt") * col("res")).as("g"))
        .collect()
      grads.foreach { r =>
        w(r.getInt(0))(r.getLong(1).toInt) += lr * r.getDouble(2) / n
      }
      e += 1
    }
    classes.zipWithIndex.flatMap { case (lang, ci) =>
      w(ci).zipWithIndex.map { case (v, b) => (lang, ci, b.toLong, v) }
    }.toDF("lang", "ci", "bucket", "w")
  }

  /** Class-index column from a literal map — a chained CASE, no UDF. */
  private def udfFreeClassIndex(label: org.apache.spark.sql.Column,
      ciOf: Map[String, Int]): org.apache.spark.sql.Column =
    ciOf.foldLeft(lit(-1)) { case (acc, (lang, ci)) =>
      when(label === lang, lit(ci)).otherwise(acc)
    }
}
