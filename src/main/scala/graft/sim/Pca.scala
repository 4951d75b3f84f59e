package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the whitening/reduction step
  * SemDeDup-lineage pipelines run before clustering/bucketing (cluster in
  * a reduced space, dedup in it, map survivors back).
  *
  * FIT follows the q95/q100 train discipline translated to linear
  * algebra: the d-mean and d×d scatter accumulate in ONE map-side-combined
  * pass (`treeAggregate` with a (1+d+d²)-double buffer — model-sized
  * partials, never row data; this is the public RowMatrix pattern and the
  * one sanctioned imperative-RDD use: per-partition dense accumulation),
  * then a DRIVER-side cyclic Jacobi eigendecomposition of the d×d
  * symmetric covariance — deterministic by construction: fixed sweep
  * order, fixed convergence threshold, eigenpairs sorted by eigenvalue
  * descending, eigenvector sign fixed by largest-|entry| positive.
  *
  * TRANSFORM is scan-shaped: k native-dot folds per row
  * ([[Ann.dot]], codegen'd) against the broadcast (mean, components)
  * literals — no shuffle, no UDF.
  *
  * 100 TB note: the scatter pass is d² flops/row (4096 at d=64) over the
  * FIT input only — production fits on a bounded sample (pass a sampled
  * frame; the estimator doesn't care) and transforms the corpus, which
  * costs k·d flops/row.
  */
object Pca {

  /** Fitted model: `components(i)` is the i-th principal axis (unit
    * length, largest-|entry| positive), `eigenvalues(i)` its variance.
    */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Mean + top-`k` principal components of `vecCol` (array<float> or
    * array<double>), via one scatter pass + driver Jacobi.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Model =
    modelFromScatter(scatterOf(df, vecCol), k)

  /** The one accumulation pass: a (1 + d + d²)-double buffer holding
    * [n, Σv, Σvvᵀ] — an exact MERGE ALGEBRA (element-wise sums), which is
    * what lets the streaming face (s27) land per-batch partials and fold
    * them later into the same model.
    */
  private[graft] def scatterOf(df: DataFrame, vecCol: String): Array[Double] = {
    // null vectors and vectors with null ELEMENTS are excluded from the
    // fit by name here — getSeq would NPE on the former and silently
    // unbox the latter to 0.0, biasing the axes with no signal
    val clean = df.filter(col(vecCol).isNotNull &&
      !exists(col(vecCol), x => x.isNull))
    val vecs = clean.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    // two actions (probe + aggregate) on a possibly-expensive upstream:
    // persist for the pass, release after
    vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try scatterOfPersisted(vecs) finally { vecs.unpersist(false); () }
  }

  private def scatterOfPersisted(
      vecs: org.apache.spark.rdd.RDD[Array[Double]]): Array[Double] = {
    val head = vecs.take(1)
    require(head.nonEmpty,
      "PCA scatter needs at least one non-null vector (empty or all-null input)")
    val d = head(0).length
    val zero = new Array[Double](1 + d + d * d)
    def seqOp(acc: Array[Double], v: Array[Double]): Array[Double] = {
      require(v.length == d, s"ragged vector: ${v.length} != $d")
      acc(0) += 1
      var i = 0
      while (i < d) { acc(1 + i) += v(i); i += 1 }
      i = 0
      while (i < d) {
        val vi = v(i)
        val base = 1 + d + i * d
        var j = 0
        while (j < d) { acc(base + j) += vi * v(j); j += 1 }
        i += 1
      }
      acc
    }
    def combOp(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
    }
    vecs.treeAggregate(zero)(seqOp, combOp)
  }

  /** Dimension encoded by a [n, Σv, Σvvᵀ] buffer's length — the ONE
    * decoder for the layout (the streaming sink shares it).
    */
  private[graft] def dimOf(bufferLen: Int): Int =
    ((math.sqrt(4.0 * (bufferLen - 1) + 1) - 1) / 2).round.toInt

  /** Model from an accumulated [n, Σv, Σvvᵀ] buffer (one batch's or a
    * fold of many — the buffer layout IS the merge state).
    */
  private[graft] def modelFromScatter(agg: Array[Double], k: Int): Model = {
    val d = dimOf(agg.length)
    require(1 + d + d * d == agg.length, s"bad scatter buffer: ${agg.length}")
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val n = agg(0)
    require(n > 1, s"PCA needs more than one vector, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => agg(1 + i) / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      agg(1 + d + i * d + j) / n - mean(i) * mean(j))
    val (vals, axes) = symmetricEigen(cov)
    Model(mean, vals.take(k), axes.take(k))
  }

  /** Append `outCol` = the k-component centered projection of `vecCol`
    * under `model` — per row, k codegen'd dot folds against broadcast
    * literals. With `whiten = true` each component divides by
    * √(eigenvalue + 1e-12), so the projected coordinates have UNIT
    * variance on the fit corpus (the actual whitening SemDeDup-style
    * stacks want before cosine thresholds: without it the first axis
    * dominates every distance).
    */
  def transform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val centered = zip_with(Ann.toDouble(col(vecCol)),
      typedlit(model.mean.toSeq), (x, m) => x - m)
    val tmp = "__pca_centered"
    require(!df.columns.contains(tmp),
      s"input frame already has a '$tmp' column (the transform's working name)")
    val withC = df.withColumn(tmp, centered)
    val comps = model.components.zipWithIndex.map { case (c, i) =>
      val proj = Ann.dot(col(tmp), typedlit(c.toSeq))
      // max(ev, 0): round-off can leave a degenerate direction's
      // eigenvalue slightly NEGATIVE; sqrt of that is NaN for every row
      if (whiten) proj / lit(math.sqrt(math.max(model.eigenvalues(i), 0.0) + 1e-12))
      else proj
    }
    withC.withColumn(outCol, array(comps.toIndexedSeq: _*)).drop(tmp)
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi rotations
    * (public textbook algorithm; Golub & Van Loan §8.5): sweeps over all
    * (p, q) pairs in fixed order until the off-diagonal Frobenius mass
    * drops below tolerance. Returns (eigenvalues desc, eigenvectors as
    * rows), signs fixed largest-|entry|-positive so the decomposition is
    * a pure function of the input.
    */
  private[graft] def symmetricEigen(m: Array[Array[Double]],
      maxSweeps: Int = 64, relTol: Double = 1e-28)
      : (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }
    // convergence threshold RELATIVE to the matrix's own Frobenius mass:
    // an absolute tolerance either declares tiny-scaled covariances
    // converged untouched (entries ~1e-12 start below 1e-20) or is
    // unreachable for large-scaled ones (eps-limited at ~1e-17·‖C‖²)
    var frobSq = 0.0
    var fi = 0
    while (fi < n) {
      var fj = 0
      while (fj < n) { frobSq += m(fi)(fj) * m(fi)(fj); fj += 1 }
      fi += 1
    }
    val stop = relTol * frobSq
    var sweep = 0
    while (sweep < maxSweeps && off() > stop) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else 1.0 / (theta - math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < n) { // A ← A·J (columns p, q)
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) { // A ← Jᵀ·A (rows p, q)
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) { // V ← V·J
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val pairs = (0 until n)
      .map(i => (a(i)(i), Array.tabulate(n)(r => v(r)(i))))
      .sortBy(-_._1)
    val fixed = pairs.map { case (ev, vec) =>
      val mx = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(mx) < 0) (ev, vec.map(x => -x)) else (ev, vec)
    }
    (fixed.map(_._1).toArray, fixed.map(_._2).toArray)
  }
}
