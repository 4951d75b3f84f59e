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
    * ~20× slower here.
    *
    * ONE aggregation (r22): the tf-weighted per-bit sum
    * Σ_tok tf(tok)·sign_j(h(tok)) equals Σ_occurrences sign_j(h(tok)) —
    * each occurrence contributes its token's ±1 once — so the per-bit
    * sums fold directly over the exploded occurrence rows and the
    * intermediate (doc, tok, tf) aggregation (a full extra shuffle, plus
    * a distinct-vocabulary broadcast join before it) disappears. hash60
    * is one generated xxhash pass per occurrence. Identical integers,
    * identical fingerprints.
    */
  def fingerprints(docs: DataFrame, id: String, text: String): DataFrame = {
    // explode_outer + null filter (the MinHash.shingleRows dodge): plain
    // explode infers an interpreted size()>0 filter re-tokenizing per doc.
    // widen: the per-doc tokenize runs before the first exchange — a
    // one-row-group corpus scan would serialize it on one core; keyed by
    // doc id, it also hands the groupBy(id) its partitioning, so the
    // 60-sum aggregation map-side combines to ONE row per doc.
    val occ = graft.sources.Sources.widen(docs, col(id))
      .select(col(id), explode_outer(TextFunctions.tokens(col(text))).as("tok"))
      .filter(col("tok").isNotNull)
      .select(col(id), TextFunctions.hash60(col("tok")).as("h"))
    // Fully-wide: 60 parallel per-bit sums through ONE groupBy(id) — the
    // minimum-work plan (occurrence rows pass the shuffle once, map-side
    // combined to one row per doc). All integer math — merge order cannot
    // perturb results.
    val sums = (0 until 60).map(j =>
      sum(expr(s"(h >> $j) & 1") * 2 - 1).as(s"_s$j"))
    val fp = (0 until 60)
      .map(j => when(col(s"_s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    occ.groupBy(col(id))
      .agg(sums.head, sums.tail: _*)
      .select(col(id), fp.as("simhash"))
      // Flat 2-column row, cached: nearPairs branches over it twice (band
      // sides a and b) — uncached, the whole tf+join+agg tree runs twice.
      .cache()
  }

  /** Band-bucket cap, ON by default (round 10). The 6 × 10-bit banding has
    * AT MOST 6·1024 buckets — at any corpus size past ~10⁵ docs every
    * bucket is corpus-fraction-sized and candidate volume is quadratic
    * (Σ C(n_bucket, 2) ≈ 3N²/1024 whatever the data; measured ×159 for
    * ×100 data on the 100× scale-up). The cap bounds candidates to
    * ≤ 3·cap·N — linear — by dropping over-cap buckets before pairing.
    *
    * 600 is ≥ every bucket the oracle SFs produce (max 62 at sf0.01, 553
    * at sf0.1) so capped results are bit-identical there, and the DuckDB
    * oracle mirrors the cap so the capped semantics are the definition.
    * The pairs a drop loses are hot-fingerprint cliques — corpus-hot
    * near-identical boilerplate whose members ALSO collide in their other
    * ≥ 6−maxHamming matching bands unless those are hot too; a clique
    * larger than the cap is exact-duplicate-grade repetition, q19's
    * territory (hamming-0 pairs of the same text are found there), not a
    * pair-enumeration problem. `maxBucket = None` opts out.
    */
  val BandBucketCap = 600

  /** (id, simhash, band, band_val) rows — 6 × 10-bit bands per doc. */
  private def bandRows(fp: DataFrame, id: String): DataFrame =
    fp.select(col(id), col("simhash"),
      explode(sequence(lit(0), lit(5))).as("band"))
      .withColumn("band_val", expr("(simhash >> (band * 10)) & 1023"))

  /** Pairs within `maxHamming` of each other, found via 6 × 10-bit bands.
    * Bucket-capped by default — see [[BandBucketCap]]; [[overCapPairs]]
    * is the side channel that keeps >cap cliques visible.
    */
  def nearPairs(fp: DataFrame, id: String, maxHamming: Int,
      maxBucket: Option[Int] = Some(BandBucketCap)): DataFrame = {
    val banded0 = bandRows(fp, id)
    // Same shape as MinHash.capBuckets: map-side count + left-semi
    // join-back, never a count-over-window on the hot bucket itself.
    val banded = maxBucket.fold(banded0)(cap => MinHash.capBuckets(banded0, cap))
    val a = banded.select(col("band"), col("band_val"), col(id).as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_val"), col(id).as("id_b"), col("simhash").as("sim_b"))
    // Hamming-verify BEFORE the distinct (r22): the filter is a pure
    // per-pair function, so dedup-then-filter and filter-then-dedup keep
    // exactly the same pairs — but filtering first shrinks the distinct's
    // shuffle from every band collision (quadratic in bucket size) to the
    // verified near-pairs, and bit_count is one generated instruction.
    a.join(b, Seq("band", "band_val")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
  }

  /** The capped family's side channel, as [[MinHash.overCapPairs]]: each
    * member of a >cap band bucket pairs with the bucket's min-id
    * representative, hamming-verified like [[nearPairs]]' output — linear
    * in bucket size, so >cap NEAR-dup cliques (the cap's recall cliff)
    * stay collapsible by curation flows. Same output contract as
    * [[nearPairs]]: (id_a, id_b, hamming), id_a < id_b by construction.
    */
  def overCapPairs(fp: DataFrame, id: String, maxHamming: Int,
      cap: Int = BandBucketCap): DataFrame =
    MinHash.overCapPairs(bandRows(fp, id), id, cap)
      .join(fp.select(col(id).as("id_a"), col("simhash").as("sim_a")), "id_a")
      .join(fp.select(col(id).as("id_b"), col("simhash").as("sim_b")), "id_b")
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))

  // ---------------------------------------------------------------------
  // Generic faces over ANY 60-bit fingerprint column — the ONE banding
  // implementation the three hash families (text simhash, image dhash,
  // audio energy envelope) share; ImageHash/Audio delegate here so a cap
  // or band-width change lands in exactly one place.
  // ---------------------------------------------------------------------

  /** Public banding rows for asymmetric (new-batch vs accumulated-index)
    * joins: (idCol, hashCol, band, band_val) — the s24/s30 sink shape.
    */
  def bandRowsOf(hashes: DataFrame, id: String, hashCol: String): DataFrame =
    hashes.select(col(id), col(hashCol),
        explode(sequence(lit(0), lit(5))).as("band"))
      .withColumn("band_val", expr(s"(`$hashCol` >> (band * 10)) & 1023"))

  /** Survivorship verdicts over the near-dup graph of any fingerprint
    * column — the q39/q63 discipline: connected components of
    * [[nearPairs]] ∪ [[overCapPairs]] (the star channel keeps >cap
    * cliques collapsible), min-id survivor per component. Every hashed
    * row gets a verdict: (id, keep, dup_of) — singletons keep themselves
    * with a null `dup_of`.
    */
  def keepSetOf(hashes: DataFrame, id: String, hashCol: String,
      maxHamming: Int,
      maxBucket: Option[Int] = Some(BandBucketCap)): DataFrame = {
    val fp = hashes.select(col(id), col(hashCol).as("simhash"))
    val direct = nearPairs(fp, id, maxHamming, maxBucket)
    val edges = maxBucket
      .fold(direct)(cap => direct.unionByName(overCapPairs(fp, id, maxHamming, cap)))
      .select(col("id_a"), col("id_b"))
    val cc = graft.ops.Graph.connectedComponents(edges, "id_a", "id_b")
    hashes.select(col(id))
      .join(cc.select(col("id").as(id), col("label")), Seq(id), "left")
      .select(col(id),
        (col("label").isNull || col("label") === col(id)).as("keep"),
        when(col("label") =!= col(id), col("label")).as("dup_of"))
  }
}
