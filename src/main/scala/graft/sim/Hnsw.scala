package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HNSW approximate nearest neighbors (Malkov & Yashunin 2016,
  * "Efficient and robust approximate nearest neighbor search using
  * Hierarchical Navigable Small World graphs" — the public graph-index
  * standard that dominates real recall/latency trade-offs), distributed
  * the way production systems shard it: the corpus hash-partitions into
  * shards, each shard builds its own in-memory HNSW graph inside ONE
  * `mapPartitions` pass (graph size bounded by shard size — the executor-
  * memory contract), the broadcast query set searches every shard's
  * graph, and the per-shard top-k merge globally with one small shuffle
  * (shards × k rows per query, never the corpus).
  *
  * Why this shape at 100 TB: a graph index cannot be built by a
  * DataFrame expression — construction is inherently sequential per graph
  * (each insert navigates the graph so far). Sharding recovers
  * parallelism: shards build independently (linear speedup), and since
  * every shard is searched, recall is the SINGLE-graph recall of the
  * shard holding the true neighbor — sharding never loses recall, it
  * multiplies candidate budget (documented: budget = shards × efSearch).
  *
  * Determinism (the kmeansCells discipline — no RNG anywhere): level
  * assignment draws its geometric variable from a splitmix64 finalizer of
  * the vector id; ties in every ordering break on smaller id; insertion
  * order is sorted-by-id within the shard; the shard assignment is
  * Spark's deterministic hash repartition on id. Same corpus + same
  * shard count ⇒ identical output, spec-pinned.
  *
  * Distances: vectors L2-normalize at insert, so cosine = dot and the
  * graph metric d = 1 − dot. Zero vectors stay zero (cos 0 to all).
  */
object Hnsw {

  final case class Hit(query_id: Long, neighbor_id: Long, cos: Double)

  /** One shard's graph. `m` = max links per node above layer 0 (layer 0
    * keeps 2m, per the paper); `efConstruction` = build-time beam width.
    * `heuristic` selects neighbors with the paper's Algorithm 4
    * (SELECT-NEIGHBORS-HEURISTIC, keepPrunedConnections) — the production
    * default; false keeps Algorithm 3 (the M closest), exposed so the
    * recall gate can assert the heuristic's advantage on clustered data.
    */
  final class Index(m: Int, efConstruction: Int, heuristic: Boolean = true) {
    require(m >= 2, s"m must be >= 2, got $m")
    require(efConstruction >= m, s"efConstruction must be >= m")
    private val mL = 1.0 / math.log(m.toDouble)
    private val m0 = 2 * m
    private val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    private val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    private val nodeLevel = scala.collection.mutable.ArrayBuffer.empty[Int]
    // links(node)(level) = ArrayBuffer of node indexes
    private val links =
      scala.collection.mutable.ArrayBuffer.empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
    private var entry = -1
    private var maxLevel = -1

    def size: Int = ids.length

    /** splitmix64 finalizer — the deterministic "uniform" for the
      * geometric level draw.
      */
    private def mix64(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }

    private def levelFor(id: Long): Int = {
      val u = ((mix64(id) >>> 11) + 1).toDouble / (1L << 53).toDouble // (0,1]
      math.min(30, (-math.log(u) * mL).toInt)
    }

    private def normalize(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v
      else { val out = new Array[Double](v.length)
        i = 0; while (i < v.length) { out(i) = v(i) / n; i += 1 }; out }
    }

    private def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      1.0 - s
    }

    /** (dist, id)-ordered: smaller distance first, smaller id on ties —
      * every heap below uses it so the whole build/search is
      * tie-deterministic.
      */
    private def closer(d1: Double, i1: Int, d2: Double, i2: Int): Boolean =
      d1 < d2 || (d1 == d2 && ids(i1) < ids(i2))

    /** Beam search of one layer (paper Algorithm 2): returns up to `ef`
      * closest nodes to `q`, ordered closest-first.
      */
    private def searchLayer(q: Array[Double], eps: Seq[Int], ef: Int,
        level: Int): scala.collection.mutable.ArrayBuffer[(Double, Int)] = {
      val visited = new java.util.HashSet[Integer]()
      implicit val candOrd: Ordering[(Double, Int)] = new Ordering[(Double, Int)] {
        // min-heap on distance via reversed max PriorityQueue
        def compare(a: (Double, Int), b: (Double, Int)): Int =
          if (closer(a._1, a._2, b._1, b._2)) 1 else if (closer(b._1, b._2, a._1, a._2)) -1 else 0
      }
      val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](candOrd)
      // results kept as a max-first queue so the worst pops in O(log n)
      val res = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](candOrd.reverse)
      eps.foreach { ep =>
        if (!visited.contains(ep)) {
          visited.add(ep)
          val d = dist(q, vecs(ep))
          cand.enqueue((d, ep)); res.enqueue((d, ep))
        }
      }
      while (res.size > ef) res.dequeue()
      while (cand.nonEmpty) {
        val (cd, c) = cand.dequeue()
        val worst = res.head
        if (closer(worst._1, worst._2, cd, c) && res.size >= ef) {
          cand.clear() // every remaining candidate is farther: done
        } else {
          val nbrs = links(c)(level)
          var i = 0
          while (i < nbrs.length) {
            val e = nbrs(i)
            if (!visited.contains(e)) {
              visited.add(e)
              val d = dist(q, vecs(e))
              val w = if (res.isEmpty) null else res.head
              if (res.size < ef || w == null || closer(d, e, w._1, w._2)) {
                cand.enqueue((d, e)); res.enqueue((d, e))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
      res.foreach(out += _)
      out.sortInPlace()(new Ordering[(Double, Int)] {
        def compare(a: (Double, Int), b: (Double, Int)): Int =
          if (closer(a._1, a._2, b._1, b._2)) -1 else if (closer(b._1, b._2, a._1, a._2)) 1 else 0
      })
      out
    }

    /** Paper Algorithm 4 (SELECT-NEIGHBORS-HEURISTIC) with
      * keepPrunedConnections: scan candidates closest-first; keep c only
      * while it is closer to the BASE than to every neighbor already
      * kept — on clustered corpora this spends the M links across
      * directions (inter-cluster bridges survive) instead of packing them
      * all into the local cluster, the connectivity loss that makes
      * simple M-closest selection degrade recall; remaining slots then
      * fill from the pruned list closest-first (the paper's
      * keepPrunedConnections flag), so node degree never drops below what
      * simple selection gives. Deterministic: candidates arrive
      * tie-ordered and every comparison is on exact doubles.
      */
    private def selectNeighbors(base: Array[Double],
        cands: scala.collection.Seq[(Double, Int)],
        maxM: Int): scala.collection.mutable.ArrayBuffer[(Double, Int)] = {
      val sorted = cands.sortWith((a, b) => closer(a._1, a._2, b._1, b._2))
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
      if (!heuristic) { sorted.take(maxM).foreach(kept += _); return kept }
      val pruned = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
      val it = sorted.iterator
      while (kept.length < maxM && it.hasNext) {
        val (d, c) = it.next()
        var ok = true
        var i = 0
        while (ok && i < kept.length) {
          if (dist(vecs(c), vecs(kept(i)._2)) < d) ok = false
          i += 1
        }
        if (ok) kept += ((d, c)) else pruned += ((d, c))
      }
      var j = 0
      while (kept.length < maxM && j < pruned.length) { kept += pruned(j); j += 1 }
      kept
    }

    /** Paper Algorithm 1; neighbor selection per [[selectNeighbors]]. */
    def insert(id: Long, raw: Array[Double]): Unit = {
      val v = normalize(raw)
      val idx = ids.length
      val l = levelFor(id)
      ids += id; vecs += v; nodeLevel += l
      links += Array.fill(l + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = idx; maxLevel = l; return }
      var ep = entry
      var lc = maxLevel
      while (lc > l) { // greedy descent above the insert level
        var improved = true
        while (improved) {
          improved = false
          var bd = dist(v, vecs(ep))
          val nbrs = links(ep)(lc)
          var i = 0
          while (i < nbrs.length) {
            val e = nbrs(i)
            val d = dist(v, vecs(e))
            if (closer(d, e, bd, ep)) { bd = d; ep = e; improved = true }
            i += 1
          }
        }
        lc -= 1
      }
      var eps = Seq(ep)
      lc = math.min(l, maxLevel)
      while (lc >= 0) {
        val w = searchLayer(v, eps, efConstruction, lc)
        val maxM = if (lc == 0) m0 else m
        val chosen = selectNeighbors(v, w, m)
        chosen.foreach { case (_, e) =>
          links(idx)(lc) += e
          links(e)(lc) += idx
          if (links(e)(lc).length > maxM) {
            // shrink e's overfull list with the SAME selection rule
            val ev = vecs(e)
            links(e)(lc) = selectNeighbors(ev,
              links(e)(lc).map(n => (dist(ev, vecs(n)), n)), maxM).map(_._2)
          }
        }
        eps = w.map(_._2).toSeq
        lc -= 1
      }
      if (l > maxLevel) { maxLevel = l; entry = idx }
    }

    /** Paper Algorithm 5: greedy descent to layer 1, beam at layer 0. */
    def search(q0: Array[Double], k: Int, efSearch: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      val q = normalize(q0)
      var ep = entry
      var lc = maxLevel
      while (lc > 0) {
        var improved = true
        while (improved) {
          improved = false
          var bd = dist(q, vecs(ep))
          val nbrs = links(ep)(lc)
          var i = 0
          while (i < nbrs.length) {
            val e = nbrs(i)
            val d = dist(q, vecs(e))
            if (closer(d, e, bd, ep)) { bd = d; ep = e; improved = true }
            i += 1
          }
        }
        lc -= 1
      }
      searchLayer(q, Seq(ep), math.max(efSearch, k), 0)
        .take(k).map { case (d, i) => (ids(i), 1.0 - d) }.toSeq
    }
  }

  /** Sharded HNSW top-k: (query_id, rank, neighbor_id, cos) — the q27
    * output contract at graph-index cost. Queries broadcast (the
    * bruteforceTopK discipline — query sets are bounded); per-query
    * exact-distance budget ≈ `shards × efSearch`, the number an
    * equal-budget comparison against IVF-PQ's shortlist uses. `shards=0`
    * derives one shard per ~`shardTarget` vectors (corpus count — one
    * metadata-rate agg), so per-executor graph memory stays bounded as
    * the corpus grows.
    */
  def hnswTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 16, efConstruction: Int = 64, efSearch: Int = 64,
      shards: Int = 0, shardTarget: Long = 2000000L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nShards =
      if (shards > 0) shards
      else math.max(1L, (corpus.count() + shardTarget - 1) / shardTarget).toInt
    val qRows = queries.select(col("id"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val qB = spark.sparkContext.broadcast(qRows)
    val hits: Dataset[Hit] = corpus.select(col("id"), col("vec"))
      .repartition(nShards, col("id"))
      .mapPartitions { it =>
        // sorted insert order: determinism given the deterministic
        // hash-shard assignment
        val rows = it.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .toArray.sortBy(_._1)
        if (rows.isEmpty) Iterator.empty
        else {
          val index = new Index(m, efConstruction)
          rows.foreach { case (id, v) => index.insert(id, v) }
          qB.value.iterator.flatMap { case (qid, qv) =>
            index.search(qv, k + 1, efSearch + 1)
              .filter(_._1 != qid).take(k)
              .map { case (nid, cos) => Hit(qid, nid, cos) }
          }
        }
      }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    hits.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
