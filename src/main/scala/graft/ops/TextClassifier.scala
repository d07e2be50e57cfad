package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Linear text classifier over hashed bag-of-words features — the
  * fastText-shaped quality/domain classifier of LLM data pipelines
  * (Joulin et al., "Bag of Tricks for Efficient Text Classification",
  * EACL 2017; the GPT-3 quality filter is exactly this shape: a linear
  * model scoring documents for curation).
  *
  * Training is full-batch multinomial logistic regression with a FIXED
  * iteration count and learning rate. Each iteration is one distributed
  * pass: the weight matrix (C x B floats, a few MB) broadcasts, each
  * document computes its softmax residuals locally, and the gradient
  * reduces through a (bucket, class) groupBy of FIXED-POINT long
  * partials — integer addition is associative, so training is
  * bit-deterministic under any partitioning (the [[Clustering.kmeans]]
  * pattern), which is what lets `q_classifier` pin exact predictions as
  * a hard oracle instead of an accuracy band.
  *
  * Scale shape: gradient shuffle rows <= min(corpus tokens, B) * C per
  * iteration with map-side combine; driver holds only W and the
  * aggregated gradient (both O(B * C), corpus-independent).
  */
object TextClassifier {

  /** Trained model: class labels in index order (deterministic sort)
    * and the weight matrix W(class)(bucket).
    */
  final case class Model(labels: Vector[String], nBuckets: Int, w: Array[Array[Float]])

  /** Hashed feature buckets of a document: murmur3(token) mod B over
    * the [[Dedup.normalizeText]] tokenization, each token weighted
    * 1/n_tokens (L1 normalization — document length does not change
    * gradient scale).
    */
  private[graft] def features(text: String, nBuckets: Int): Array[(Int, Double)] = {
    val toks = Option(text).getOrElse("").trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Array.empty
    else {
      val x = 1.0 / toks.length
      val m = collection.mutable.HashMap.empty[Int, Double]
      toks.foreach { t =>
        val b = math.floorMod(MurmurHash3.stringHash(t), nBuckets)
        m.update(b, m.getOrElse(b, 0.0) + x)
      }
      m.toArray.sortBy(_._1)
    }
  }

  private def softmax(scores: Array[Double]): Array[Double] = {
    val mx = scores.max
    val e = scores.map(s => math.exp(s - mx))
    val z = e.sum
    e.map(_ / z)
  }

  private def scoresOf(w: Array[Array[Float]], fs: Array[(Int, Double)]): Array[Double] =
    w.map { wc =>
      var s = 0.0
      var i = 0
      while (i < fs.length) { s += wc(fs(i)._1) * fs(i)._2; i += 1 }
      s
    }

  /** Train on (textCol, labelCol). Deterministic: label order sorted,
    * zero-init weights, fixed iterations, fixed-point gradient sums.
    */
  def train(
      docs: DataFrame,
      labelCol: String,
      textCol: String = "text",
      nBuckets: Int = 1 << 16,
      iters: Int = 20,
      lr: Double = 2.0): Model = {
    require(nBuckets > 0 && iters >= 0 && lr > 0, s"bad hyperparams: $nBuckets, $iters, $lr")
    val spark = docs.sparkSession
    import spark.implicits._

    val labels = docs.select(col(labelCol).cast("string")).distinct()
      .as[String].collect().sorted.toVector
    require(labels.nonEmpty, "no labels")
    val labelIdx = labels.iterator.zipWithIndex.toMap
    val c = labels.length
    val n = docs.count().toDouble
    require(n > 0, "empty training set")

    // Features are a pure function of the text — extract ONCE and
    // persist the hashed sparse vectors, so each of the `iters` epochs
    // pays only arithmetic, not a re-tokenization of the corpus (the
    // string pass dominated the epoch at every scale). Deliberately
    // NOT fanned out at small scale: an epoch's whole gradient pass is
    // ~0.2 s of arithmetic, and a 32-task fan-out costs more in task
    // scheduling than the serial compute it parallelizes (measured
    // 2.8 s -> 8.1 s on the bench corpus).
    val corpus = docs
      .select(col(textCol).cast("string").as("t"), col(labelCol).cast("string").as("y"))
      .as[(String, String)]
      .map { case (t, y) => (features(t, nBuckets), y) }
      .persist()

    val w = Array.fill(c)(new Array[Float](nBuckets))
    val bIdx = spark.sparkContext.broadcast(labelIdx)
    val Scale = (1L << 24).toDouble
    var it = 0
    while (it < iters) {
      val bw = spark.sparkContext.broadcast(w)
      // (bucket, class) -> fixed-point gradient partials. Rows per doc
      // = nnz * C; map-side combine collapses them to <= B * C.
      val grad = corpus
        .flatMap { case (fs, y) =>
          if (fs.isEmpty) Iterator.empty
          else {
            val p = softmax(scoresOf(bw.value, fs))
            val yi = bIdx.value(y)
            for {
              ci <- p.indices.iterator
              r = p(ci) - (if (ci == yi) 1.0 else 0.0)
              if r != 0.0
              (b, x) <- fs.iterator
            } yield (b, ci, math.round(r * x * Scale))
          }
        }
        // Untyped sum: codegen'd hash aggregate with map-side partials
        // (the typed reduceGroups path it replaces object-hashed every
        // row through boxed tuples).
        .toDF("b", "ci", "g")
        .groupBy($"b", $"ci")
        .agg(org.apache.spark.sql.functions.sum($"g").as("g"))
        .as[(Int, Int, Long)]
        .collect()
      bw.destroy()
      grad.foreach { case (b, ci, g) =>
        w(ci)(b) = (w(ci)(b) - lr * (g / Scale) / n).toFloat
      }
      it += 1
    }
    corpus.unpersist(blocking = false)
    Model(labels, nBuckets, w)
  }

  /** (doc_id, predicted): argmax class per document, ties broken by
    * label order. One broadcast + one shuffle-free map.
    */
  def predict(
      docs: DataFrame,
      model: Model,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    val pred = udf { (text: String) =>
      val m = bm.value
      val fs = features(text, m.nBuckets)
      val s = scoresOf(m.w, fs)
      var best = 0
      var i = 1
      while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
      m.labels(best)
    }
    docs.select(col(idCol).as("doc_id"), pred(col(textCol)).as("predicted"))
  }
}
