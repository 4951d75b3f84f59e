package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: match a small incoming batch against a large
  * master dimension on a name-like key within `maxDist` edits — the
  * two-bank entity-resolution step of the reference's CDM harmonization
  * (reference: the 4_silver notebooks union two banks' customer records
  * whose keys agree only fuzzily).
  *
  * A naive linkage is a near-quadratic theta-join (measured 173s at sf0.1
  * vs 2.5s blocked). Blocking is pigeonhole over the discriminating suffix:
  * tiled into `maxDist + 2` segments, two equal-length names within
  * `maxDist` SUBSTITUTIONS keep at least two segments intact, so they
  * agree on one of the two-segment JOINT keys and candidate generation is
  * an equi-join on (length, segment_pair_idx, joint_value) — the exact
  * Levenshtein only runs on candidates: O(batch × block), never
  * O(master²).
  *
  * Segment boundaries are DERIVED FROM THE DATA, not hand-tuned: one
  * aggregation pass over the master measures per-position character
  * cardinality of the suffix, and the positions are split into contiguous
  * segments of balanced log-cardinality (≈ entropy). Equal-width splits
  * degenerate on skewed keys — an all-constant first segment is one block
  * holding the entire table (measured: 3-3-3 splits on zero-padded ids =
  * the whole master in one '000' bucket; the entropy-balanced split
  * reproduces the 7-1-1 tiling a hand analysis found). At 100 TB, run the
  * measurement pass on a seeded sample of the master — boundaries only
  * need the cardinality PROFILE, not exact counts.
  */
object FuzzyLink {

  /** Linkage-block cap, ON by default (round 11 — the [[graft.text.MinHash.BucketCap]]
    * discipline applied to linkage blocks). A blocking key shared by B
    * master rows meets every batch row carrying the same key: one
    * degenerate key (an all-constant suffix segment, a cloned-name
    * corpus) turns candidate generation into batch × B — the 100×
    * derived corpus measured ~640M true edges precisely because every
    * name is cloned 100-fold and every block is hot. With the cap,
    * candidates are bounded by cap × |blocked batch rows| — linear in
    * the batch — because only ≤cap master blocks survive per key.
    *
    * 2000 sits strictly above every block the oracle-verified corpora
    * produce (measured master-side maxima: 100 at sf0.01, 150 at sf0.1,
    * 1500 at the 10× derived corpus), so capped results are identical
    * there and the q50 completeness check against the TRUE quadratic
    * oracle still holds; only the ≥100× degenerate regime is capped. A
    * dropped block loses candidate pairs that agree on NO other blocking
    * key (unlike LSH bands there is no other vote for a pair whose only
    * agreement is the hot segment — though pairs within substitution
    * distance usually share several of the C(maxDist+2, 2) joint keys
    * and all deletion-variant keys). `maxBlock = None` restores
    * exhaustive candidates; `failOnOverCap = true` turns the cap into a
    * named diagnosis instead — the degenerate-key corpus dies with the
    * block key and size in the error, not by committing the cluster to
    * the quadratic output.
    */
  val BlockCap = 2000

  /** Contiguous (start, length) segments (1-based, for `substr`) tiling
    * positions 1..suffixLen of `right(nameCol, suffixLen)`, balanced by
    * measured per-position approx character cardinality. All-constant
    * suffixes fall back to equal widths (every position weighs the same
    * epsilon).
    */
  def entropySegments(master: DataFrame, nameCol: String, suffixLen: Int,
      segments: Int): Seq[(Int, Int)] = {
    require(segments >= 1 && suffixLen >= segments,
      s"need suffixLen >= segments, got $suffixLen < $segments")
    val sfx = expr(s"right($nameCol, $suffixLen)")
    val aggs = (1 to suffixLen).map(p =>
      approx_count_distinct(substring(sfx, p, 1)).as(s"_c$p"))
    val row = master.agg(aggs.head, aggs.tail: _*).head()
    val w = (0 until suffixLen).map(i =>
      math.log(math.max(row.getLong(i).toDouble, 1.0)) + 1e-9)
    val target = w.sum / segments
    val res = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    var acc = 0.0
    for (p <- 0 until suffixLen) {
      acc += w(p)
      val positionsLeft = suffixLen - p - 1
      val segsLeft = segments - res.size - 1
      if (res.size < segments - 1 &&
          (acc >= target - 1e-12 || positionsLeft == segsLeft)) {
        res += ((start + 1, p - start + 1)); start = p + 1; acc = 0.0
      }
    }
    res += ((start + 1, suffixLen - start))
    res.toSeq
  }

  /** (key_a, key_b, name_a, name_b, dist) pairs with
    * `levenshtein(name_a, name_b) <= maxDist` and equal name lengths,
    * batch × master.
    *
    * Blocking completeness: an equal-length pair within Levenshtein 2 is
    * either (a) ≤2 SUBSTITUTIONS — tiling the suffix into maxDist + 2
    * segments, at most maxDist are damaged, so AT LEAST TWO stay intact
    * and the pair agrees on one of the C(maxDist+2, 2) two-segment
    * joint keys (pigeonhole); or (b) ONE insert + ONE delete — a run
    * shift that can disagree on every tiling segment. The second blocking
    * pass covers (b): such a pair's suffixes always share an
    * (suffixLen−1)-char string reachable by deleting one character from
    * each (delete the shifted run's first char on one side and its last
    * on the other), so the single-deletion-variant equi-join finds it.
    * For maxDist ≤ 2 the union of the two passes is therefore COMPLETE
    * w.r.t. equal-length Levenshtein; at maxDist > 2 multi-shift
    * combinations (2 inserts + 2 deletes, …) remain outside the contract.
    *
    * TWO-SEGMENT keys, not single segments (r5): with maxDist + 1 single
    * segments, one low-cardinality segment makes one fat block — measured
    * at sf0.1, the two single-digit segments of the zero-padded customer
    * suffix put the whole batch in their '0' blocks: 405k of 417k
    * candidates came from those two classes alone. Joint keys multiply
    * the selectivity of their two segments: same data, 103k candidates
    * (4×), identical matches (the exact Levenshtein verify is unchanged,
    * and completeness holds by the ≥2-intact argument above). Cost:
    * C(maxDist+2, 2) rows per record instead of maxDist + 1 — at
    * maxDist = 2 that is 6 vs 3 — through the same equi-join shape.
    * Deletion variants are deduped per record (`array_distinct`) before
    * exploding: repeated characters (zero-padding runs) make many of the
    * suffixLen variants identical, and k identical variants per side
    * turn one true pair into k² joined rows.
    *
    * Block budget: master-side blocks larger than `maxBlock` are dropped
    * (default [[BlockCap]] — see its scaladoc for the bound argument and
    * the oracle-SF headroom) or, with `failOnOverCap = true`, raise a
    * named error carrying the hot key and its size.
    */
  def linkage(batch: DataFrame, master: DataFrame, keyCol: String, nameCol: String,
      suffixLen: Int, maxDist: Int,
      maxBlock: Option[Int] = Some(BlockCap),
      failOnOverCap: Boolean = false): DataFrame = {
    maxBlock.foreach(c => require(c >= 1, s"maxBlock must be positive, got $c"))
    // Suffixes too short to tile into maxDist + 2 parts fall back to the
    // single-segment scheme (agree on ≥1 of maxDist + 1 — same
    // completeness, just without the joint-key selectivity).
    val usePairs = suffixLen >= maxDist + 2
    val segs = entropySegments(master, nameCol, suffixLen,
      if (usePairs) maxDist + 2 else maxDist + 1)
    val segPairs = for {
      i <- segs.indices; j <- segs.indices if i < j
    } yield (i, j)
    def blocked(df: DataFrame, keyAs: String, nameAs: String): DataFrame = {
      // Joint key of segment pair (i, j): the two substrings concatenated.
      // Unambiguous without a separator — (len, pair id) fix both widths.
      val tiling =
        if (usePairs) segPairs.zipWithIndex.map { case ((i, j), pid) =>
          val (si, li) = segs(i)
          val (sj, lj) = segs(j)
          struct(lit(pid).as("i"),
            concat(col("_sfx").substr(si, li), col("_sfx").substr(sj, lj)).as("seg"))
        }
        else segs.zipWithIndex.map { case ((st, ln), i) =>
          struct(lit(i).as("i"), col("_sfx").substr(st, ln).as("seg"))
        }
      // Deletion variants share one key namespace (i = -1): the covering
      // variant may sit at DIFFERENT deletion positions on the two sides.
      val blockArr =
        if (maxDist < 2) array(tiling: _*)
        else {
          val dels = (1 to suffixLen).map { d =>
            concat(col("_sfx").substr(1, d - 1),
              col("_sfx").substr(d + 1, suffixLen - d))
          }
          concat(array(tiling: _*),
            transform(array_distinct(array(dels: _*)),
              v => struct(lit(-1).as("i"), v.as("seg"))))
        }
      // explode_outer + null filter (the MinHash.shingleRows dodge): plain
      // explode infers a size()>0 filter rebuilding the whole block/
      // deletion-variant array per row in an interpreted Filter. Block
      // structs are struct() literals, never null.
      // widen: the block/deletion-variant array build is per-row-heavy
      // and runs before the first exchange (no-op at scale).
      graft.sources.Sources.widen(df, col(keyCol))
        .select(col(keyCol).as(keyAs), col(nameCol).as(nameAs),
          length(col(nameCol)).as("len"),
          expr(s"right($nameCol, $suffixLen)").as("_sfx"))
        .select(col(keyAs), col(nameAs), col("len"),
          explode_outer(blockArr).as("b"))
        .filter(col("b").isNotNull)
        .select(col(keyAs), col(nameAs), col("len"),
          col("b.i").as("i"), col("b.seg").as("seg"))
    }
    val masterBlocked = {
      val mb = blocked(master, "key_b", "name_b")
      maxBlock.fold(mb) { cap =>
        // Master-side per-key counts: map-side-combinable agg + left-semi
        // join back (the MinHash.capBuckets shape — never a count-over-
        // window, whose partition would be the hot block itself). Capping
        // the master side alone bounds the join: candidates <= cap ×
        // |blocked batch rows|.
        val counts = mb.groupBy(col("len"), col("i"), col("seg"))
          .agg(count(lit(1)).as("_bn"))
        val small =
          if (failOnOverCap)
            // The named diagnosis rides the JOIN KEY (seg), which the
            // semi-join must evaluate for every aggregated key — a
            // projection-only _bn check would be pruned out of the plan.
            counts.select(col("len"), col("i"),
              when(col("_bn") > cap, raise_error(concat(
                lit("fuzzy_link: blocking key (len="), col("len").cast("string"),
                lit(", segment="), col("i").cast("string"),
                lit(", value='"), col("seg"), lit("') holds "),
                col("_bn").cast("string"),
                lit(s" master rows > maxBlock=$cap — a degenerate name key " +
                  "makes candidate generation quadratic; deduplicate the key " +
                  "upstream, raise maxBlock, or accept the documented drop " +
                  "with failOnOverCap=false"))))
                .otherwise(col("seg")).as("seg"))
          else counts.filter(col("_bn") <= cap)
            .select(col("len"), col("i"), col("seg"))
        mb.join(small, Seq("len", "i", "seg"), "left_semi")
      }
    }
    blocked(batch, "key_a", "name_a")
      .join(masterBlocked, Seq("len", "i", "seg"))
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b")).distinct()
      // Thresholded Levenshtein early-exits once the running distance
      // exceeds maxDist (returns -1), pruning the verify from O(n²) to
      // O(maxDist·n) per rejected candidate — most candidates reject.
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      // Cached (family discipline, as MinHash.signature): the linkage
      // feeds both the pair query (q50) and entity clustering / golden
      // record (q63) — identical plans share one materialization. Linked
      // pairs are far smaller than their inputs.
      .cache()
  }
}
