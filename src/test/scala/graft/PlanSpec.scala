package graft

/** Scale-shape assertions: these specs pin the PLANS, not just the results —
  * broadcast joins stay broadcast, filters reach the parquet scan, and scans
  * stay narrow. A regression here is a 100-TB performance bug even when
  * results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q06 star join broadcasts every dimension") {
    val p = plan("q06_star_agg")
    assert(p.contains("BroadcastHashJoin"))
    // customer, nation, region all broadcast → no shuffle-hash/sort-merge join
    // on the dim side; the only SortMergeJoin allowed is lineitem⋈orders.
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3)
  }

  test("q01 pushes the shipdate filter into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q06 prunes the lineitem scan to the 3 needed columns") {
    val p = plan("q06_star_agg")
    val readSchema = p.linesIterator.find(l => l.contains("ReadSchema") && l.contains("lineitem"))
    assert(readSchema.exists { l =>
      l.contains("l_orderkey") && l.contains("l_extendedprice") &&
        l.contains("l_discount") && !l.contains("l_shipdate") && !l.contains("l_quantity")
    })
  }

  test("q04 dedup is a single shuffle (one Exchange below the window)") {
    val p = plan("q04_dedup_latest")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("q37 as-of join is windowed union, not a theta join") {
    val p = plan("q37_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of join must not expand pairs:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("q38 range join broadcasts the bands side") {
    val p = plan("q38_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q42 stratified sampling is a pure pushed filter — zero exchanges") {
    val p = plan("q42_stratified_sample")
    // the sample predicate is a row-local hash filter; only the final
    // presentation sort may exchange
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q21 candidate generation never goes quadratic") {
    val p = plan("q21_minhash_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"dedup must stay equi-join on band keys:\n$p")
    assert(p.contains("BroadcastHashJoin"), "vocab hash join should broadcast")
  }

  test("q105 link graph is scan → explode → one bounded agg (no window, " +
      "no pair expansion)") {
    val p = plan("q105_link_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"link graph must never pair docs:\n$p")
    assert(!p.contains("Window"), s"no per-doc window in the edge rollup:\n$p")
    assert(p.contains("Generate explode"), "anchor list explodes row-locally")
  }

  test("q109 top-50 cut is TakeOrdered, never a global sort; no pair blowup") {
    val p = plan("q109_collocations")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketed tables join without a shuffle (i05 co-located join)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 1.5)).toDF("k", "fid", "amt")
    val dims = (0L until 50L).map(i => (i, s"dim_$i")).toDF("k", "name")
    graft.sources.Sinks.bucketed(facts, "b_facts", "k", 8)
    graft.sources.Sinks.bucketed(dims, "b_dims", "k", 8)
    val j = spark.table("b_facts").hint("MERGE").join(spark.table("b_dims"), "k")
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$p")
    assert(j.count() == 1000)
  }

  test("q50 fuzzy linkage stays an equi-join on blocking keys — never quadratic") {
    val p = plan("q50_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"linkage must block, not cross:\n$p")
  }

  test("q67 dense containment path is shuffle-free: broadcast NLJ, no hash exchange after the bitset build") {
    // The dense-vocab path's whole point: pair generation must be a
    // broadcast nested-loop (no Exchange between the bitset frames and the
    // pair filter), with the popcount running as the native expression.
    val p = plan("q67_containment")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"dense containment must pair via broadcast NLJ:\n$p")
    assert(p.contains("graft_bitand_count"),
      s"dense containment must verify via the native popcount:\n$p")
  }

  test("q67/q68 cache sharing: the containmentJoin subtrees canonicalize equal") {
    // The q67↔q68 one-materialization contract rides CacheManager's
    // sameResult canonicalization of the two independently-built
    // containmentJoin plans; if either call site's inputs drift the cache
    // silently degrades to double materialization (the sf10-measured 443s
    // re-pay). Pin the equality itself.
    val a = graft.text.Containment
      .containmentJoin(Tables.documents(spark, sfDir), "doc_id", "text", 0.8)
    val b = graft.text.Containment
      .containmentJoin(Tables.documents(spark, sfDir), "doc_id", "text", 0.8)
    assert(a.queryExecution.optimizedPlan.sameResult(b.queryExecution.optimizedPlan),
      "containmentJoin plans no longer canonicalize equal — q68 would re-pay q67's pair generation")
  }

  test("cache registry: registered frames release in one call and re-materialize (r15)") {
    import spark.implicits._
    val df = Graft.registerCache(Seq(1, 2, 3).toDF("x"))
    df.count()
    assert(df.storageLevel.useMemory, "registered frame should be cached after an action")
    assert(Graft.releaseCaches() >= 1)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "releaseCaches must unpersist every registered frame")
    // a re-registration re-materializes — release is a batch boundary,
    // not a permanent opt-out
    Graft.registerCache(df)
    df.count()
    assert(df.storageLevel.useMemory)
    Graft.releaseCaches()
  }

  test("q66 winnow pair join is an equi-join on fingerprints — never quadratic") {
    val p = plan("q66_winnow")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"winnow matching must block on fingerprints, not cross:\n$p")
  }

  test("q72 chunk dedup: min-struct aggregation, no Window, never quadratic") {
    val p = plan("q72_chunk_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup must block on chunk_hash, not cross:\n$p")
    // First-occurrence-wins is a groupBy min(struct) + join-back — a
    // row_number window would hand a corpus-frequent boilerplate chunk
    // (the operator's target case) to ONE task's sorted buffer at 100×.
    assert(!p.contains("Window"),
      s"chunk dedup must not use a window (hot-key partition at scale):\n$p")
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"min-struct must partially aggregate map-side (hot-key shrink before shuffle):\n$p")
  }

  test("q74 bigram LM stays at two corpus passes (the denominator folds from counts)") {
    // Counted on the cache-substituted LOGICAL plan: InMemoryRelation is a
    // leaf there, so live Generates = corpus explodes actually executed by
    // THIS query (the cache build pays the one other pass, once). 1 live
    // explode + 2 cached reads = the two-pass claim; a third live explode
    // means the w1 denominator regressed to its own corpus pass.
    val q = SparkEntry.queries("q74_bigram_logprob")(spark, sfDir).queryExecution
    val live = q.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }.size
    val cachedReads = q.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r }.size
    assert(live == 1, s"expected 1 live corpus explode, found $live:\n${q.optimizedPlan}")
    assert(cachedReads == 2,
      s"both count consumers must read the cached vocab table, found $cachedReads")
    assert(!q.executedPlan.toString.contains("CartesianProduct"))
  }

  test("q82 line dedup: min-struct aggregation, no Window, no quadratic join") {
    val q = SparkEntry.queries("q82_line_dedup")(spark, sfDir).queryExecution
    val p = q.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"line dedup must block on line hashes, not cross:\n$p")
    // First-occurrence-wins is a groupBy min(struct) + join-back — a
    // row_number window over the line hash would hand a corpus-frequent
    // boilerplate line (the operator's target case: "Privacy Policy", nav
    // chrome, license headers) to ONE task's sorted buffer at 100×, and
    // AQE cannot split window partitions.
    assert(!p.contains("Window"),
      s"line dedup must not use a window (hot-key partition at scale):\n$p")
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"min-struct must partially aggregate map-side (hot-key shrink before shuffle):\n$p")
    // The lines subtree feeds the agg build AND the join probe: exactly 2
    // Generates. A third would mean the rollup re-derived the lines.
    val gens = q.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }.size
    assert(gens == 2, s"expected 2 corpus explodes (agg build + join probe), found $gens")
  }

  test("q52 ntile: no segment-partitioned window anywhere (two-phase RDD rank)") {
    val q = SparkEntry.queries("q52_ntile")(spark, sfDir).queryExecution
    // The distributed ntile is the RDD two-pass (one shared range shuffle,
    // rank from broadcast offsets) — a window partitioned by the 5-value
    // segment would hand corpus/5 rows to one task, and the DataFrame
    // double-reference spelling is unsound (two independently-sampled
    // range exchanges — see Windows.ntileDistributed's doc).
    val wins = q.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.isEmpty, s"expected no windows, got ${wins.size}:\n${q.optimizedPlan}")
    assert(q.executedPlan.toString.contains("ExistingRDD"),
      s"expected the two-pass RDD rank path:\n${q.executedPlan}")
  }

  test("q56 tfidf: document frequency is an aggregation, not a per-token window") {
    val q = SparkEntry.queries("q56_tfidf")(spark, sfDir).queryExecution
    val wins = q.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    // Only the per-doc term-rank window survives — a df window partitioned
    // by token would hand a stop-word's postings list to one task.
    assert(wins.size == 1, s"expected 1 window, got ${wins.size}:\n${q.optimizedPlan}")
    assert(wins.head.partitionSpec.exists(_.references.exists(_.name == "doc_id")),
      s"the surviving window must partition per document:\n${q.optimizedPlan}")
  }

  test("q85 boilerplate grams: top-N without a global sort, no cartesian") {
    val p = plan("q85_boilerplate_grams")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"boilerplate grams must stay scan->agg->topN:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N must plan per-partition (no global sort):\n$p")
  }

  test("q84 quality cutoff: broadcast join-back, no window, one aggregation shuffle") {
    val p = plan("q84_quality_cutoff")
    assert(!p.contains("CartesianProduct"), s"quality cutoff must not cross:\n$p")
    // The per-source cutoff is an aggregation (bounded GK summary per
    // source, map-side partial), never a per-source window — a window
    // would sort every source's documents in one task.
    assert(!p.contains("Window"),
      s"quality cutoff must not use a window (per-source sort at scale):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"catalog-sized cutoffs must broadcast back:\n$p")
  }

  test("q76 co-purchase: capped map-side expansion, top-N without a global sort") {
    val p = plan("q76_copurchase")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairing must be the map-side basket explode, never a self-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must run as per-partition top-N, not a global sort:\n$p")
  }

  test("q77 gap fill: per-key calendar (no global cross join), guard not pruned") {
    val q = SparkEntry.queries("q77_gap_fill")(spark, sfDir).queryExecution
    val p = q.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"calendar must be per-key sequence explode, never a global calendar join:\n$p")
    // The span guard must survive optimization: raise_error rides the
    // calendar-building when(), so column pruning cannot drop it.
    assert(q.optimizedPlan.toString.contains("raise_error"),
      "gap-fill span guard was optimized away")
  }

  test("q83 source overlap: map-side per-gram pairing, broadcast counts, no doc-pair join") {
    val p = plan("q83_source_overlap")
    assert(!p.contains("CartesianProduct"),
      s"source pairing must ride the per-gram basket explode:\n$p")
    // the per-source vocab counts join back as broadcasts (S rows)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q73 IVF-PQ: pair expansion only against broadcast state, codes never cross-joined") {
    val p = plan("q73_ann_ivfpq")
    assert(!p.contains("CartesianProduct"),
      s"PQ scoring must ride broadcast lookup tables, never a cross join:\n$p")
    // ADC tables and codebooks broadcast; candidate scoring is equi-join.
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q28 hyperplane bucket build is one wide aggregation — at most 2 exchanges") {
    // The wide form carries `planes` parallel sums through ONE groupBy(id);
    // the regression shape (explode per plane + two groupBys) costs a
    // planes× bigger first shuffle and a third exchange.
    val p = plan("q28_ann_lsh")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected <=2 hash exchanges in bucket build, got $exchanges:\n$p")
    assert(p.contains("BroadcastHashJoin"), "sign table should broadcast-join")
  }

  test("q22 simhash fingerprint build: ONE aggregation over occurrence rows, no join") {
    // The fully-wide form carries 60 parallel bit-sums through ONE
    // groupBy(doc) folding directly over the exploded occurrences
    // (Σ tf·sign ≡ Σ-per-occurrence sign): regression shapes (per-bit
    // explode, 3×20 bit-group split, the (doc,tok) tf pre-aggregation,
    // the distinct-vocab broadcast join) multiply shuffles or rows.
    import graft.text.SimHash
    val p = SimHash.fingerprints(Tables.documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected <=2 hash exchanges in fingerprint build, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"fingerprint build should not join:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Generate explode(sequence")),
      "bit-group explode crept back into the fingerprint build")
  }

  test("q62 incremental merge: both windows reach the scan as data filters") {
    // The state/delta split must filter on ts (scan-level, pushable /
    // partition-prunable in a real layout) — not on the derived day string.
    val p = plan("q62_incremental_agg")
    val filters = p.linesIterator.filter(_.trim.startsWith("+- Filter")).toSeq ++
      p.linesIterator.filter(_.contains("Filter (")).toSeq
    assert(filters.nonEmpty, s"no filters in the split plan:\n$p")
    assert(!filters.exists(_.contains("date_format")),
      s"day-string filtering replaced the ts predicate:\n${filters.mkString("\n")}")
  }

  test("q88 bloom decontaminate: probe prunes below every exchange, verify stays equi") {
    val p = plan("q88_bloom_decontaminate")
    // The bloom probe rides the one-row broadcast (NLJ); the only joins on
    // corpus-sized rows must be equi-joins (the exact verify) — never a
    // cartesian over data.
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // The probe filter exists and the corpus branch reaches it unshuffled.
    // Exchange budget (pre-AQE), all on bounded sides: eval-gram distinct
    // (1), bits build per-word agg + global assembly (2), exact-verify
    // equi-join sides (2), final countDistinct two-stage agg (3:
    // (doc,gram) dedup + partial/final on doc) = 8. A 9th exchange means
    // corpus grams started shuffling BEFORE the bloom probe pruned them.
    assert(p.linesIterator.exists(l => l.contains("xxhash64")),
      s"no bloom-probe expression found:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange SinglePartition"))
    assert(exchanges <= 8, s"expected <= 8 exchanges, got $exchanges:\n$p")
  }

  test("q87 span dedup: no doc-pair join anywhere — the linear dedup face") {
    val p = plan("q87_span_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"span dedup must never materialize doc pairs:\n$p")
    // per-doc window only: every Window partitions by doc_id
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("doc_id")), windows.mkString("\n"))
  }

  test("q90 contamination spans: broadcast semi join against eval hashes, no pair expansion") {
    val p = plan("q90_contamination_spans")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination spans must never expand pairs:\n$p")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("doc_id")), windows.mkString("\n"))
  }

  test("q92 bpe encode is scan-shaped: zero hash exchanges, no join") {
    // Pure projection through the native expression — the only exchange
    // the plan may carry is the orderBy's range partitioning.
    val p = plan("q92_bpe_encode")
    assert(!p.contains("Exchange hashpartitioning"), s"projection grew a shuffle:\n$p")
    assert(!p.contains("Join"), s"projection grew a join:\n$p")
    assert(p.contains("rangepartitioning"), p)
  }

  test("q93 html extract: one reassembly shuffle, broadcast join-back, no pair joins") {
    val p = plan("q93_html_extract")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly the per-doc reassembly exchange, got $exchanges:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q94 span trim: no doc-pair join, every window partitioned by doc") {
    val p = plan("q94_span_trim")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span trim must never expand pairs:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"every trim window must be doc-bounded:\n${windows.mkString("\n")}")
  }

  test("q96 bpe pack: two-phase prefix sum — no corpus-wide single-partition window") {
    val p = plan("q96_bpe_pack")
    // windows: within-bucket cumsum (partitioned by _bkt) and the
    // bucket-totals global offset (one row per bucket by design); a
    // corpus-ordered unpartitioned window over doc_id is the 100-TB bug.
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.size == 2, windows.mkString("\n"))
    assert(windows.count(_.contains("_bkt")) == 2,
      s"both windows must key on the coarse bucket:\n${windows.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q115 corpus shuffle: hash-space prefix sum — both windows bucket-keyed, " +
      "no corpus-wide single-partition window (r17)") {
    val p = plan("q115_corpus_shuffle")
    // same invariant as q96/q113: the ONLY unpartitioned window runs over
    // bucket totals (one row per hash-space bucket), never the corpus
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.size == 2, windows.mkString("\n"))
    assert(windows.count(_.contains("_bkt")) == 2,
      s"both windows must key on the hash-space bucket:\n${windows.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q117 frontier budget: broadcast delay dim, host-partitioned rank, " +
      "no pair join (r17)") {
    val p = plan("q117_frontier_budget")
    assert(p.contains("BroadcastHashJoin"), s"delay dim must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the rank window partitions by host — never a global sort
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("target_host")),
      s"rank must be host-partitioned:\n${windows.mkString("\n")}")
  }

  test("q97 contamination trim: broadcast eval probe, doc-bounded windows, no pair join") {
    val p = plan("q97_contamination_trim")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination trim must never expand pairs:\n$p")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("doc_id")),
      s"every trim window must be doc-bounded:\n${windows.mkString("\n")}")
  }

  test("q98 temperature sampling is a pushed filter — zero hash exchanges") {
    // Thresholds are driver-derived constants; the row decision is a
    // hash-mod compare that must reach the scan as a data filter.
    val p = plan("q98_temperature_sample")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-row gating must not shuffle:\n$p")
    assert(!p.contains("Join"), s"threshold fold must not become a join:\n$p")
  }

  test("q99 novelty: vocab-keyed aggregation + equi-join, no windows, no pair join") {
    val p = plan("q99_novelty")
    assert(!p.contains("windowspecdefinition"), s"novelty needs no window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q101 image dhash: banded equi-join candidates, never a pair expansion") {
    val p = plan("q101_image_dhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"image near-dup must stay on the banded equi-join:\n$p")
    // the bucket cap's count must be map-side combined, not a window over
    // the hot bucket (the MinHash.capBuckets discipline)
    assert(!p.contains("Window"), s"no window on the band bucket:\n$p")
  }

  test("q102 url curate: broadcast blocklist anti-join, domain-partitioned window") {
    val p = plan("q102_url_curate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist must broadcast anti-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the cap window partitions by domain — never a corpus-wide
    // single-partition sort
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("domain")),
      s"cap window must partition by domain:\n$windowLines")
  }

  test("q104 langid scoring: broadcast weights, max-struct argmax, no per-doc window") {
    val p = plan("q104_langid_learned")
    assert(p.contains("BroadcastHashJoin"), s"weights must broadcast:\n$p")
    assert(!p.contains("Window"), s"argmax must be the max-struct agg, not a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q120 eos pack: vocab lookup is a map literal (no join), assembly is " +
      "equi-joins only — never a pair blowup") {
    val p = plan("q120_eos_pack")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"eos pack must stay equi-join shaped:\n$p")
    // the subword→id lookup is element_at on a broadcast literal — no
    // extra join beyond the manifest⋈tokens assembly join
    assert(p.contains("element_at"), s"vocab lookup must be the map literal:\n$p")
  }

  test("q121 epoch plan: positions come from the bucketed hash-space rank — " +
      "no corpus-wide single-partition sort (epochPlan itself)") {
    import org.apache.spark.sql.functions._
    val full = graft.ops.SequencePack.manifest(
        Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            size(graft.text.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", seqLen = 256, bucketSize = 64)
      .groupBy(col("seq_id")).agg(sum(col("len")).as("_t"))
      .filter(col("_t") === 256L)
    val p = graft.sources.TokenShards.epochPlan(full, epochs = 2,
      seed = "s17", seqLen = 256, seqsPerShard = 64, dtype = "u2")
      .queryExecution.executedPlan.toString
    // the within-bucket window partitions by _bkt; a global rank would
    // show an Exchange rangepartitioning (total sort) or a
    // single-partition window
    assert(!p.contains("Exchange rangepartitioning"),
      s"epoch positions must never globally sort:\n$p")
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("_bkt")),
      s"rank window must partition by the hash bucket:\n$windowLines")
  }

  test("whole-stage codegen covers the q01 aggregation") {
    // Under AQE the codegen spans only appear in the finalized plan, and
    // simpleString renders them as "*(n)" stage markers.
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }
}
