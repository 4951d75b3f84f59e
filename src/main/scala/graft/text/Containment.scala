package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Asymmetric set-containment join over shingle sets: find ordered pairs
  * (a, b) with `|shingles(a) ∩ shingles(b)| / |shingles(a)| >= threshold` —
  * the quote-inclusion / boilerplate-wrap shape symmetric Jaccard dedup is
  * blind to (a short document fully quoted inside a long one has containment
  * ~1 but Jaccard ~|a|/|b|, far below any near-dup threshold).
  *
  * TWO physical paths, picked by a measured corpus statistic (the same way
  * a join picks broadcast vs shuffle from size stats):
  *
  *  - SPARSE vocabulary (real text — the 100 TB regime): prefix-filter
  *    blocking (the ppjoin family's core). Order every document's shingle
  *    hashes by ascending document frequency (ties on hash) and emit the
  *    first `m = min(n, ⌊(1−t)·n⌋ + c)` as probe keys against the full
  *    inverted index; a candidate must match at least `m − ⌊(1−t)·n⌋` of
  *    them (pigeonhole: b misses at most ⌊(1−t)·n⌋ of a's elements, so a
  *    true pair always shares that many probes — completeness is exact for
  *    every c, and the df order puts each document's rarest shingles in
  *    the probes). The exact intersection verify (`cand ⋈ rows_a ⋈semi
  *    rows_b → count`) runs on candidates only; everything is flat
  *    (id, hash) rows — no array is ever shuffled or cached.
  *
  *  - DENSE vocabulary (measured `|vocab| <= denseVocabMax`): signature
  *    blocking is structurally non-discriminating — with few distinct
  *    shingles even each document's rarest have high df, so near-all pairs
  *    collide (measured at sf0.1: vocab 931, probe df ≈ 185, c=1 candidates
  *    = 9.87M of 25M possible). No blocking beats exhaustive here, so the
  *    dense path makes the exhaustive compare optimal instead: each
  *    document's shingle set becomes a `⌈vocab/64⌉`-long bitset over the
  *    global hash rank, pairs come from a broadcast nested-loop join (no
  *    shuffle), and the intersection is native popcount codegen
  *    ([[graft.functions.BitAndCount]]) — a few machine words per pair.
  *    The N² pair count is bounded by the corpus that triggers the path:
  *    a dense vocabulary means template-generated near-duplicate text,
  *    where the MATCH set itself approaches N², i.e. the output, not the
  *    algorithm, is quadratic.
  *
  * Both paths produce identical rows (and both are property-tested against
  * the quadratic truth; the DuckDB oracle for q67 is the quadratic
  * definition, so the driver check verifies blocking completeness).
  *
  * Reference anchor: the 4_silver notebooks' dedup keeps only whole-row /
  * near-whole-text duplicates; containment is the corpus-curation
  * generalization a training-data pipeline needs for sub-document overlap.
  */
object Containment {

  /** (id_a, id_b, containment) with containment(a→b) >= `threshold`,
    * over distinct word-bigram shingle sets (empty-shingle docs — under
    * two tokens — cannot be contained and are excluded). Both directions
    * of a symmetric near-dup pair appear; a strict quote-inclusion shows
    * only (quoted → quoting).
    *
    * @param minProbeMatches sparse-path probe-count bound c (see object
    *   scaladoc) — measured at sf0.1: c=1 → 9.87M candidates, c=3 → 1.11M,
    *   c=6 → 25k
    * @param denseVocabMax switch to the dense bitmap path when the corpus'
    *   distinct-shingle count is at or below this (0 forces sparse)
    * @param denseBroadcastMaxBytes upper bound on the estimated size of the
    *   broadcast bitset table (`docs × (⌈vocab/64⌉·8 + 16) B`) before the
    *   dense path is allowed — vocabulary density alone does NOT bound the
    *   corpus row count, and the dense path broadcasts EVERY document's
    *   bitset: a billion template-generated docs over a 1k vocabulary is
    *   exactly the dense-vocab regime yet would ship ~150 GB to every
    *   executor. Past the budget the sparse path (correct in every regime)
    *   runs instead.
    * @param maxSparseCandidates fail-fast budget on the sparse path's
    *   candidate expansion, Σ over probe rows of df(probe hash) — the
    *   exact row count the probe⋈index join produces. On a corpus whose
    *   rarest per-doc shingles are still corpus-hot (a saturated/
    *   boilerplate-dominated shingle space — the regime the 100× scale
    *   run exposed), prefix filtering stops discriminating and that join
    *   quietly goes quadratic; the estimate is one bounded agg over the
    *   already-built probe frame, so the operator dies with a NAMED error
    *   (pointing at dedup-first / the minhash family / a higher budget)
    *   instead of committing the cluster to 10¹³ join rows. 0 disables.
    */
  def containmentJoin(docs: DataFrame, id: String, text: String,
      threshold: Double, minProbeMatches: Int = 6,
      denseVocabMax: Long = 4096,
      denseBroadcastMaxBytes: Long = 256L << 20,
      maxSparseCandidates: Long = 4_000_000_000L): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(minProbeMatches >= 1, s"minProbeMatches >= 1, got $minProbeMatches")
    // Flat (id, h) shingle-hash rows — distinct per doc by construction
    // (withShingles dedups the shingle array). The ONE frame every later
    // step derives from; cached because 4-5 subplans read it.
    // NOT widened (Sources.widen): unlike q66's per-character hashing, the
    // shingle build is not this plan's dominant cost, and a 4-run
    // interleaved A/B measured the widen shuffle as a net loss here
    // (q68 2.4 → 3.0s) — more tiny-partition stage overhead than the
    // parallelized build repays at bench scale.
    // explode_outer + output-null filter, NOT plain explode (the
    // MinHash.shingleRows dodge): explode makes the optimizer infer a
    // `size(shingles) > 0` filter below the Generate with the whole
    // tokenize+shingle expression inlined — a NON-codegen interpreted
    // Filter re-running the per-document chain several times (measured at
    // sf0.1: 12.0s vs 0.3s for this one explode). Shingle elements are
    // concat_ws output, never null, so the output filter drops exactly
    // the empty-array docs plain explode would.
    // widen: the sf-test documents table is one row group = one task; the
    // r20 A/B that measured widen as a net loss here predates the explode
    // fix above (the serial interpreted filter dominated both arms) — with
    // the build cost now the tokenize+hash itself, parallelizing it wins
    // (measured at sf0.1: rows build 2.7s serial vs 0.6s widened).
    val rows = MinHash.shingleRows(
        MinHash.withShingles(graft.sources.Sources.widen(docs), id, text), id)
      .select(col(id), TextFunctions.hash60(col("shingle")).as("h"))
      .cache()
    val dfh = rows.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // Driver-side scalars decide the path (FuzzyLink's entropySegments
    // discipline: boundaries from a stats pass, profile not exact counts).
    // Both stats read the cached flat rows; doc count only runs when the
    // vocab test already passed (short-circuit keeps sparse corpora at one
    // stats job).
    val vocab = dfh.count()
    def denseFits: Boolean = {
      val nDocs = rows.select(col(id)).distinct().count()
      val bitsetBytes = ((vocab + 63) / 64) * 8 + 16
      nDocs * bitsetBytes <= denseBroadcastMaxBytes
    }
    if (vocab <= denseVocabMax && denseFits) dense(rows, id, threshold, vocab)
    else sparse(rows, dfh, id, threshold, minProbeMatches, maxSparseCandidates)
  }

  /** Containment on the tie-free floor grid (q24 discipline: round(x, 4)
    * lands i/n on exact .xxxx5 halves where Spark HALF_UP and DuckDB
    * disagree by one ulp; the grid is the same double arithmetic in both).
    */
  private def grid(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d

  private def sparse(rows: DataFrame, dfh: DataFrame, id: String,
      threshold: Double, minProbeMatches: Int,
      maxSparseCandidates: Long): DataFrame = {
    val sizes = rows.groupBy(col(id)).agg(count(lit(1)).as("n"))
    // Rare-first rank within each doc under the global (df, h) order.
    val byRarity = Window.partitionBy(col(id)).orderBy(col("df"), col("h"))
    val maxMiss = floor(lit(1.0 - threshold) * col("n"))
    val m = least(col("n"), maxMiss + minProbeMatches)
    val probes = rows.join(dfh, Seq("h"))
      .withColumn("_rn", row_number().over(byRarity))
      .join(sizes, Seq(id))
      .filter(col("_rn") <= m)
      .select(col(id).as("id_a"), col("h"), (m - maxMiss).as("_need"),
        col("df"))
    if (maxSparseCandidates > 0) {
      // One bounded agg over the probe frame (rows is cached; the window
      // re-runs once): Σ df(probe hash) IS the probe⋈index join's output
      // row count — the quantity that goes quadratic when prefix filtering
      // stops discriminating.
      val est = Option(probes.agg(sum(col("df"))).head().get(0))
        .fold(0L)(_.asInstanceOf[Long])
      if (est > maxSparseCandidates) throw new IllegalArgumentException(
        s"containment_join: sparse-path candidate expansion would be $est rows " +
          s"(> budget $maxSparseCandidates) — the corpus's rarest per-document " +
          "shingles are still corpus-hot, so prefix-filter blocking cannot " +
          "discriminate (saturated/boilerplate-dominated shingle space). " +
          "Dedup the corpus first (q19/q72/q82), use the capped minhash " +
          "family for near-dup discovery, or raise maxSparseCandidates if " +
          "the cluster can hold the join.")
    }
    val probesKeyed = probes.drop("df")
    val cand = probesKeyed
      .join(rows.select(col(id).as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_got"), first(col("_need")).as("_need"))
      .filter(col("_got") >= col("_need"))
      .select(col("id_a"), col("id_b"))
    // |A ∩ B| per candidate: A's rows semi-joined to B's, then counted.
    cand
      .join(rows.select(col(id).as("id_a"), col("h")), Seq("id_a"))
      .join(rows.select(col(id).as("id_b"), col("h")), Seq("id_b", "h"), "left_semi")
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_inter"))
      .join(sizes.select(col(id).as("id_a"), col("n").as("_na")), Seq("id_a"))
      .withColumn("containment", col("_inter") * lit(1.0) / col("_na"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), grid(col("containment")).as("containment"))
  }

  private def dense(rows: DataFrame, id: String, threshold: Double,
      vocab: Long): DataFrame = {
    val words = ((vocab + 63) / 64).toInt
    // Global dense rank of each hash: one single-partition window over
    // vocab rows — metadata-rate by the density precondition.
    val ranks = rows.select(col("h")).distinct()
      .withColumn("r", row_number().over(Window.orderBy(col("h"))) - 1)
    // One bitset row per doc, built by the native one-pass graft_bitset
    // (the prior interpreted filter+aggregate HOF ran words × |ranks|
    // lambda evals and allocated `words` filtered arrays PER DOCUMENT —
    // ~13M evals at sf0.1; the HOF spelling stays as the parity-pinned
    // specification in TextSpec). The per-PAIR hot path below is the
    // native codegen popcount.
    // Cached (the `rows` discipline): BOTH sides of the pair join read the
    // bitset table, and uncached each side re-pays the collect_list
    // aggregation — worse, that ObjectHashAggregate child (collect_list
    // cannot hash-agg declaratively) blocks whole-stage codegen for the
    // nested-loop join, so the 25M-pair popcount condition evaluated
    // INTERPRETED (measured at sf0.1: join stage 4.1s interpreted vs 1.4s
    // codegen over InMemoryTableScan inputs).
    val bits = rows.join(ranks, Seq("h"))
      .groupBy(col(id))
      .agg(collect_list(col("r")).as("_rs"), count(lit(1)).as("n"))
      .select(col(id), col("n"),
        call_function("graft_bitset", col("_rs"), lit(words)).as("bits"))
      .cache()
    // Stream side repartitioned to session width (r22): the cached bitset
    // aggregate comes back AQE-coalesced to ~one partition (advisory-size
    // coalescing over a few MB), so the N² popcount loop ran on ONE task
    // — 2.4-3.5 s of q67's 2.8 s, and the 1.13 core-scaling ratio the r21
    // record showed. The dense path's input is broadcast-budget-bounded
    // (denseBroadcastMaxBytes), so the extra exchange is metadata-rate at
    // any scale, and the pair loop is embarrassingly parallel.
    val width = rows.sparkSession.sessionState.conf.numShufflePartitions
    val a = bits.select(col(id).as("id_a"), col("n").as("_na"), col("bits").as("_ba"))
      .repartition(width, col("id_a"))
    val b = bits.select(col(id).as("id_b"), col("n").as("_nb"), col("bits").as("_bb"))
    a.crossJoin(broadcast(b))
      // Cheap size conjunct BEFORE the popcount: containment(a→b) =
      // |A∩B|/|A| and |A∩B| <= |B|, so |B|/|A| < t already excludes the
      // pair — same division spelling as the containment compare, so the
      // double-arithmetic bound is exact (integer numerators <= 2^53
      // convert exactly; division is monotone in the numerator). Prunes
      // ~38% of pairs at sf0.1 before any bitset word is touched.
      .filter(col("id_a") =!= col("id_b") &&
        col("_nb") * lit(1.0) / col("_na") >= threshold)
      .withColumn("containment",
        call_function("graft_bitand_count", col("_ba"), col("_bb")) * lit(1.0) / col("_na"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), grid(col("containment")).as("containment"))
  }
}
