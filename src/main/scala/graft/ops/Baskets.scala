package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-basket item pairing — the candidate-generation step of
  * market-basket / co-occurrence analysis (the pairwise slice of frequent
  * itemsets; reference analog: the gold-layer fact aggregations of
  * 5_gold/fact_transaction.py re-read as "which parts sell together").
  *
  * The pair expansion is map-side C(n,2) over each basket's distinct item
  * set, which is quadratic in basket size — the classic skew scale-killer
  * when one degenerate basket (a crawler cart, a batch-import order) holds
  * 10^5 items: 5×10^9 pairs from a single row. `maxBasket` is therefore a
  * REQUIRED bound, applied as a deterministic truncation: the basket's
  * distinct items are sorted ascending and only the first `maxBasket`
  * (smallest item ids) pair up, so one bad basket contributes at most
  * C(maxBasket, 2) pairs and results are reproducible run-to-run (no
  * "whichever items arrived first" nondeterminism). Truncation slightly
  * undercounts support for items that only co-occur in over-cap baskets —
  * the standard trade; callers who need those baskets exactly can
  * pre-split them upstream.
  *
  * The per-group `collect_set` buffer stays LINEAR in raw basket size
  * (bytes, not pairs — the quadratic term is what the cap removes); a
  * corpus with adversarially huge baskets should pre-aggregate
  * `(basket, item)` distinct before calling.
  */
object Baskets {

  /** One row per ordered item pair `(item_a < item_b)` co-occurring in a
    * basket, at most C(maxBasket, 2) pairs per basket (see object doc for
    * the truncation contract). Output columns: `basketCol`, `item_a`,
    * `item_b`.
    */
  def pairs(items: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 256): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    // Output/working names must not collide with caller columns (the
    // ShardPack discipline): a caller `item_a` would silently alias into
    // the pair output and corrupt downstream grouping. No exemption for
    // basketCol/itemCol — a basket or item column NAMED item_a/_ps would
    // produce duplicate or shadowed output columns just the same.
    val reserved = Seq("item_a", "item_b", "_ps", "_p")
    require(!reserved.contains(basketCol) && !reserved.contains(itemCol),
      s"basketCol/itemCol must not use Baskets working/output names " +
        s"(${reserved.mkString(", ")}); got basketCol=$basketCol itemCol=$itemCol")
    val clash = items.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input columns collide with Baskets working/output names: ${clash.mkString(", ")}")
    val ps: Column = slice(array_sort(collect_set(col(itemCol))), 1, maxBasket)
    // widen: the partial collect_set runs in the SCAN stage — a one-row-
    // group input serializes it on one core (no-op at scale, and for
    // already-shuffled inputs like q83's gram frame). Pair expansion and
    // its explode discipline live in pairsOfSets.
    pairsOfSets(
      graft.sources.Sources.widen(items, col(basketCol))
        .groupBy(col(basketCol))
        .agg(ps.as("_ps")),
      basketCol)
  }

  /** The C(n,2) pair expansion over a PREBUILT basket frame
    * (`basketCol`, `_ps` = sorted distinct item array, already truncated) —
    * the one pair-construction definition [[pairs]] and callers that
    * derive other statistics from the same basket frame (q83's per-source
    * vocabulary counts) share, so pairing semantics can't drift.
    *
    * The pair build is [[graft.functions.SortedPairs]] (native, codegen) —
    * the prior nested-transform HOF spelling evaluated interpreted per
    * basket, the last CodegenFallback in q76's map-side stage; OpsSpec
    * pins the HOF spelling as the parity specification. explode_outer +
    * output-null filter, NOT plain explode (the MinHash.shingleRows
    * dodge): plain explode makes the optimizer infer `size(...) > 0`
    * below the Generate, re-running the whole pair build per basket
    * inside an interpreted Filter. Pair structs are never null, so the
    * output filter drops exactly the empty-pairs baskets plain explode
    * would.
    */
  def pairsOfSets(baskets: DataFrame, basketCol: String): DataFrame =
    baskets
      .select(col(basketCol),
        explode_outer(call_function("graft_pairs", col("_ps"))).as("_p"))
      .filter(col("_p").isNotNull)
      .select(col(basketCol), col("_p.item_a"), col("_p.item_b"))

  /** Pair support counts: distinct baskets containing both items, top
    * `topN` by support with a full deterministic tiebreak (support desc,
    * then both item ids) — runs as TakeOrderedAndProject (per-partition
    * top-N, no global sort).
    */
  def copurchaseTopN(items: DataFrame, basketCol: String, itemCol: String,
      topN: Int, maxBasket: Int = 256): DataFrame =
    pairs(items, basketCol, itemCol, maxBasket)
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(col("n_baskets").desc, col("item_a"), col("item_b"))
      .limit(topN)
}
