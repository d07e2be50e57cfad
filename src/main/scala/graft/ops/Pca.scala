package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the dimensionality-reduction
  * step of embedding pipelines (SemDeDup clusters PCA-reduced vectors;
  * IVF-PQ recall improves on decorrelated inputs; OPQ is PQ after a
  * rotation exactly like this one).
  *
  * Scale shape: ONE pass over the corpus accumulates the d-vector sum
  * and the upper-triangular d x d Gram matrix per partition as
  * FIXED-POINT longs (integer addition is associative, so the fitted
  * model is bit-identical under any partitioning — the
  * [[Clustering.kmeans]] determinism pattern); partials reduce
  * element-wise, and the driver does the O(d^3) eigendecomposition
  * (breeze `eigSym` — Spark's bundled linear algebra) on the d x d
  * covariance. Nothing corpus-sized ever reaches the driver; cost is
  * independent of N beyond the one scan.
  *
  * Inputs are unit-normalized before fitting (consistent with the
  * cosine-metric pipeline; also bounds the fixed-point accumulators:
  * |x_i x_j| <= 1, scale 2^20, safe to ~2^43 rows per partition tree).
  */
object Pca {

  /** Fitted model: the corpus mean (in unit-normalized space), the top
    * `k` principal axes (rows, descending eigenvalue) and their
    * eigenvalues.
    */
  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  private val Scale = (1L << 20).toDouble

  /** Fit the top-`k` axes. One distributed pass + driver eigSym. */
  def fit(
      embs: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Model = {
    require(k >= 1, s"k >= 1: $k")
    val spark = embs.sparkSession
    import spark.implicits._

    val parts = embs.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { it =>
        var d = -1
        var n = 0L
        var s: Array[Long] = null
        var g: Array[Long] = null
        it.foreach { v =>
          val u = Similarity.unit(v)
          if (d < 0) { d = u.length; s = new Array[Long](d); g = new Array[Long](d * (d + 1) / 2) }
          n += 1
          var i = 0
          var t = 0
          while (i < d) {
            s(i) += math.round(u(i) * Scale)
            var j = i
            while (j < d) {
              g(t) += math.round(u(i) * u(j) * Scale)
              j += 1; t += 1
            }
            i += 1
          }
        }
        if (d < 0) Iterator.empty
        else Iterator.single((n, s.toSeq, g.toSeq))
      }
      .collect()
    require(parts.nonEmpty, "PCA.fit: empty corpus")

    val d = parts.head._2.length
    val n = parts.iterator.map(_._1).sum.toDouble
    val s = new Array[Long](d)
    val g = new Array[Long](d * (d + 1) / 2)
    parts.foreach { case (_, ps, pg) =>
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      var t = 0
      while (t < g.length) { g(t) += pg(t); t += 1 }
    }
    val mean = s.map(_ / Scale / n)
    // Cov = G/n - mean mean^T (symmetric).
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = g(t) / Scale / n - mean(i) * mean(j)
        cov(i, j) = v; cov(j, i) = v
        j += 1; t += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val kk = math.min(k, d)
    val order = (0 until d).sortBy(c => -es.eigenvalues(c)).take(kk)
    val comps = order.map { c =>
      val col = Array.tabulate(d)(r => es.eigenvectors(r, c))
      // Deterministic sign convention: first nonzero coordinate >= 0
      // (LAPACK's sign is arbitrary; pin it so save/compare is stable).
      val nz = col.find(x => math.abs(x) > 1e-12).getOrElse(1.0)
      if (nz < 0) col.map(-_) else col
    }.toArray
    Model(mean, comps, order.map(es.eigenvalues(_)).toArray)
  }

  /** (vec_id, pca array<float>): centered projections onto the model's
    * axes; `whiten` additionally scales each coordinate by
    * 1/sqrt(eigenvalue) (unit-variance output — the OPQ/ZCA use).
    */
  def transform(
      embs: DataFrame,
      model: Model,
      whiten: Boolean = false,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val proj = udf { (v: Seq[Float]) =>
      val m = bc.value
      val u = Similarity.unit(v)
      val d = math.min(u.length, m.mean.length)
      m.components.indices.map { c =>
        val comp = m.components(c)
        var s = 0.0
        var i = 0
        while (i < d) { s += (u(i) - m.mean(i)) * comp(i); i += 1 }
        val out = if (whiten) {
          val ev = m.eigenvalues(c)
          if (ev > 1e-12) s / math.sqrt(ev) else 0.0
        } else s
        out.toFloat
      }
    }
    embs.select(col(idCol).cast("long").as("vec_id"), proj(col(vecCol)).as("pca"))
  }

  /** Mean squared reconstruction error of projecting onto the model's
    * axes and back — the variance NOT captured by the top k.
    */
  def reconstructionError(
      embs: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Double = {
    val spark = embs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val err = udf { (v: Seq[Float]) =>
      val m = bc.value
      val u = Similarity.unit(v)
      val d = math.min(u.length, m.mean.length)
      val centered = Array.tabulate(d)(i => u(i) - m.mean(i))
      val coeffs = m.components.map { comp =>
        var s = 0.0; var i = 0
        while (i < d) { s += centered(i) * comp(i); i += 1 }
        s
      }
      var e = 0.0
      var i = 0
      while (i < d) {
        var r = 0.0
        var c = 0
        while (c < coeffs.length) { r += coeffs(c) * m.components(c)(i); c += 1 }
        val t = centered(i) - r
        e += t * t
        i += 1
      }
      e
    }
    embs.select(avg(err(col(vecCol)))).as[Double].head()
  }
}
