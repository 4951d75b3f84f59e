package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge set — the cluster step of
  * near-duplicate dedup: LSH/Jaccard emits PAIRS, but curation needs one
  * representative per duplicate CLUSTER (transitive closure of pairs).
  *
  * Min-label propagation with pointer jumping: every vertex starts labeled
  * with its own id; each round takes the min label across neighbors, then
  * follows label → label's-own-label (path compression), so convergence is
  * O(log diameter) rounds. Each round is a couple of distributed joins +
  * a min-aggregation (shuffle on vertex id); the driver only reads one
  * scalar per round.
  *
  * Iterative DataFrame lineage grows multiplicatively (the propagation plan
  * references the previous round's plan several times), which makes
  * driver-side analysis/optimization exponential in the round count —
  * measured 30s+ for a 473-vertex graph. Every round therefore ends in an
  * EAGER `localCheckpoint()`, which severs the logical plan at a
  * materialized RDD: planning cost per round stays constant. (On a
  * fault-tolerant cluster run, `spark.sparkContext.setCheckpointDir` +
  * `checkpoint()` is the durable equivalent.)
  */
object Graph {

  /** (id, cluster_id) for every vertex appearing in `edges` (src, dst);
    * cluster_id = min vertex id in the component.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 20): DataFrame = {
    // Materialized once — severs the (possibly expensive) pipeline that
    // produced the pairs from every round's plan.
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    // Labels only decrease, so sum(label) is a monotone convergence metric:
    // unchanged sum ⇔ no label changed — a one-scalar check per round
    // instead of a join against the previous round.
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum("label")).head.get(0)).fold(0L)(_.asInstanceOf[Long])
    var prevSum = labelSum(labels)

    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // Min label across self and neighbors…
      val nmin = sym.join(labels, sym("b") === labels("id"))
        .select(col("a").as("id"), col("label"))
        .union(labels)
        .groupBy("id").agg(min("label").as("label"))
      // …then pointer-jump: follow label → that vertex's current label
      // (always ≤, since a vertex's label starts at its own id and only
      // decreases). Both reads of `nmin` are cheap plans over checkpointed
      // RDDs, so recomputing it twice beats materializing it.
      val jump = nmin.select(col("id").as("_lid"), col("label").as("_llabel"))
      val prop = nmin.join(jump, nmin("label") === jump("_lid"))
        .select(col("id"), col("_llabel").as("label"))
        .localCheckpoint()
      val s = labelSum(prop)
      labels = prop
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    labels
  }
}
