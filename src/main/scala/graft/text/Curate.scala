package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the pipeline the dedup family feeds
  * (reference: the silver notebooks' dedup-then-survive discipline,
  * 4_silver/silver_customers.py, applied to a training corpus):
  * exact dedup ∧ near-dup cluster keep-best ∧ quality gate, composed as
  * ONE Catalyst plan.
  *
  * A document survives when it is
  *  (a) the min-id keeper of its exact-normalized-fingerprint group,
  *  (b) either in no near-dup cluster, or its cluster's highest-quality
  *      member (ties on the smaller id — an exact copy can never outrank
  *      its keeper: identical text means identical quality, so the min-id
  *      tiebreak keeps the keeper), and
  *  (c) at or above `minQuality` on the tie-free floor grid
  *      (`floor(score·10⁴ + 0.5)` — same double arithmetic in Spark and
  *      DuckDB, so thresholding never lands on an engine-divergent tie).
  *
  * Scale: each leg is an already-audited operator — one map-side-combined
  * groupBy for (a); banded LSH candidates, array-side Jaccard verify and
  * convergence-bound pointer-jumping CC for (b); a single scan for (c).
  * Nothing is quadratic in the corpus, and every intermediate the legs
  * share (shingles → signature → verified pairs) is the family-cached
  * frame the standalone operators build.
  */
object Curate {

  /** (doc_id, quality_score) of surviving documents.
    *
    * @param docs       (id, text) corpus
    * @param id         document id column (long)
    * @param text       text column
    * @param k          MinHash signature width (family standard: 16)
    * @param bandK      signature components used for banding
    * @param bandRows   rows per band (bandK / bandRows bands)
    * @param minJaccard near-dup edge threshold (exact Jaccard on verify)
    * @param minQuality survival threshold on the floor grid (0..10000)
    * @param overCapStars also route [[MinHash.overCapPairs]]' star
    *        candidates (each over-cap-bucket member × its min-id
    *        representative) through the SAME exact-Jaccard verify: a
    *        >BucketCap NEAR-dup clique saturates its own band buckets, so
    *        under the cap alone it yields zero candidates and every
    *        member survives — the cap's documented recall cliff. The
    *        stars stay linear in clique size and false candidates die in
    *        the verify. OFF by default: the q65 oracle (and the whole
    *        capped family's SQL definition) mirrors plain capped
    *        candidates — at oracle SFs no bucket exceeds the cap, so the
    *        flag changes nothing there; at saturation scale it trades the
    *        oracle-mirrored spelling for clique recall.
    * @param gopherRules additionally require [[Gopher.verdicts]]' combined
    *        `keep` (rule gate BEFORE the score gate — the production
    *        curation order: rules are cheap, interpretable drops; the
    *        score then ranks what rules kept). OFF by default: the q65
    *        oracle predates the rule family, and this synthetic corpus's
    *        sub-50-token docs would fail `words_ok` wholesale.
    */
  /** @param classifierWeights additionally require the LEARNED gate: a
    *        positive [[QualityClassifier]] logit under these weights
    *        (trained via `QualityClassifier.train` or any fixed table) —
    *        the third stage of the production curation order (cheap rules
    *        → learned classifier → score floor), applied BEFORE keeper
    *        election like the other gates. OFF (None) by default: the q65
    *        oracle predates the classifier.
    */
  def keepSet(docs0: DataFrame, id: String, text: String,
      k: Int = 16, bandK: Int = 4, bandRows: Int = 2,
      minJaccard: Double = 0.5, minQuality: Int = 5000,
      overCapStars: Boolean = false, gopherRules: Boolean = false,
      classifierWeights: Option[Array[Double]] = None): DataFrame = {
    // No widen at entry (r21 measured): the heavy branch (shingles) is
    // widened inside MinHash.withShingles; the remaining branches (quality
    // grid, rule verdicts, fingerprint election) are light enough that an
    // exchange per branch costs more than the parallelism buys locally.
    val docs = docs0
    val sh = MinHash.withShingles(docs, id, text)
    val sig = MinHash.signature(MinHash.shingleRows(sh, id), id, k)
    val bands = MinHash.bands(sig, id, bandK, bandRows)
    val baseCand = MinHash.candidates(bands, id)
    val cand =
      if (!overCapStars) baseCand
      else baseCand
        .unionByName(MinHash.overCapPairs(bands, id, MinHash.BucketCap))
        .distinct()
    val edges = MinHash.jaccard(sh, cand, id)
      .filter(col("jaccard") >= minJaccard).select(col("id_a"), col("id_b"))
    val scored = docs.select(col(id), TextFunctions.qualityGrid(col(text)).as("_th"))
    val cc = graft.ops.Graph.connectedComponents(edges, "id_a", "id_b")
      .select(col("id").as(id), col("label"))
    // EVERY gate applies BEFORE exact-dup keeper election (the documented
    // production order): the min-id keeper pick must land on a member that
    // will actually SURVIVE the rule and quality gates, or a doomed winner
    // eliminates every surviving member of its group (no survivor at
    // all). Exact-dup groups genuinely hit both cases: the fingerprint
    // normalizes whitespace, but the rule verdicts read RAW lines
    // (bullet/ellipsis ratios) AND the quality score reads RAW chars
    // (alpha/punct ratios over len(text)) — so two fingerprint-identical
    // variants can straddle either gate. Cluster keep-best needs no
    // quality care: it picks MAX quality, which fails the floor only when
    // every member does.
    val gatedByRules =
      if (!gopherRules) scored
      else scored.join(
        Gopher.verdicts(docs, id, text).filter(col("keep")).select(col(id)),
        Seq(id), "left_semi")
    val ruled = classifierWeights.fold(gatedByRules)(w =>
      gatedByRules.join(
        QualityClassifier.score(docs, id, text, w)
          .filter(col("pass")).select(col(id)),
        Seq(id), "left_semi"))
    val keeperPool = docs.join(
      ruled.filter(col("_th") >= minQuality).select(col(id)),
      Seq(id), "left_semi")
    val exactKeepers = keeperPool
      .withColumn("fp", md5(TextFunctions.normalizeText(col(text))))
      .groupBy(col("fp")).agg(min(col(id)).as(id))
      .select(col(id))
    val clusterKept = cc.join(ruled, id)
      .groupBy(col("label"))
      .agg(max(struct(col("_th"), (-col(id)).as("_neg"))).as("_m"))
      .select(col("label"), (-col("_m.`_neg`")).as("_kept"))
    ruled
      .join(exactKeepers, Seq(id), "left_semi")
      .join(cc, Seq(id), "left")
      .join(clusterKept, Seq("label"), "left")
      .filter(col("label").isNull || col(id) === col("_kept"))
      .filter(col("_th") >= minQuality)
      .select(col(id), (col("_th") / 10000d).as("quality_score"))
  }

  /** Per-stage curation FUNNEL report (q119): the observability face a
    * production corpus pipeline monitors per snapshot — how many
    * documents (and tokens) survive each curation stage, in the q65
    * production order's cheap-to-expensive sequence:
    * raw (eval sources excluded) → gopher rule gate → exact-dedup keeper
    * election (min id per normalized fingerprint, WITHIN rule survivors
    * — a doomed winner must not eliminate its group) → decontamination
    * (any `n`-gram shared with the `evalPred` set drops the doc) →
    * the quality floor. One (stage_id, stage, n_docs, n_tokens) row per
    * stage; attrition between rows IS the report.
    *
    * Scale shape: every stage is a filter or an equi semi/anti-join off
    * the previous one (rule verdicts scan-shaped, keeper election one
    * fingerprint groupBy, decontamination the q69 broadcast gram probe);
    * the five stat rows are metadata-rate aggregates.
    */
  def funnel(docs0: DataFrame, id: String, text: String,
      evalPred: Column, n: Int = 8, minQuality: Int = 5000): DataFrame = {
    // Same one-widen-at-entry discipline as keepSet: the flag frame, rule
    // verdicts and contamination probe are all per-doc-heavy off `docs`.
    val docs = graft.sources.Sources.widen(docs0, col(id))
    val spark = docs.sparkSession
    val base = docs.filter(!evalPred)
    // ONE corpus pass builds an id-thin per-doc flag frame (token count,
    // quality grid, fingerprint, rule verdict, contamination flag); a
    // naive per-stage union re-ran the scan+tokenize work once per stat
    // row. The flag frame persists across the keeper-election self-join
    // and the single final aggregate, then releases.
    val flags = base.select(col(id),
        size(TextFunctions.tokens(col(text))).cast("long").as("_n"),
        TextFunctions.qualityGrid(col(text)).as("_th"),
        md5(TextFunctions.normalizeText(col(text))).as("_fp"))
      .join(Gopher.verdicts(base, id, text).select(col(id), col("keep").as("_g")),
        Seq(id), "left")
      .join(Decontaminate.hits(docs, id, text, evalPred, n)
        .select(col(id)).withColumn("_c", lit(true)), Seq(id), "left")
      .persist()
    try {
      // keeper election among rule survivors (the q65 doomed-winner
      // discipline: electing over raw docs could crown a rule-failed id)
      val keepers = flags.filter(col("_g"))
        .groupBy(col("_fp")).agg(min(col(id)).as(id))
        .select(col(id)).withColumn("_k", lit(true))
      // furthest surviving stage per doc, then ONE cumulative rollup
      val lvl = flags.join(keepers, Seq(id), "left")
        .withColumn("_lvl",
          when(!coalesce(col("_g"), lit(false)), 0)
            .when(col("_k").isNull, 1)
            .when(col("_c").isNotNull, 2)
            .when(col("_th") < minQuality, 3)
            .otherwise(4))
      val aggs = (0 to 4).flatMap { k =>
        Seq(sum(when(col("_lvl") >= k, 1L).otherwise(0L)).as(s"_d$k"),
          sum(when(col("_lvl") >= k, col("_n")).otherwise(0L)).as(s"_t$k"))
      }
      val r = lvl.agg(aggs.head, aggs.tail: _*).head()
      val names = Seq("raw", "gopher_rules", "exact_dedup",
        "decontaminated", "quality_floor")
      import spark.implicits._
      names.zipWithIndex.map { case (name, k) =>
        (k.toLong, name,
          Option(r.getAs[java.lang.Long](s"_d$k")).map(_.longValue).getOrElse(0L),
          Option(r.getAs[java.lang.Long](s"_t$k")).map(_.longValue).getOrElse(0L))
      }.toDF("stage_id", "stage", "n_docs", "n_tokens")
    } finally { flags.unpersist(); () }
  }
}
