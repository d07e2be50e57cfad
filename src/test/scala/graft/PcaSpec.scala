package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("recovers a planted principal axis") {
    // Points along direction (1,1,0,...)/sqrt(2) with small orthogonal
    // noise: the top component must align with it.
    val rnd = new scala.util.Random(7)
    val d = 8
    val rows = (0 until 500).map { i =>
      val t = rnd.nextGaussian() * 10
      val v = Array.tabulate(d)(j =>
        (if (j == 0 || j == 1) t / math.sqrt(2.0) else 0.0) + rnd.nextGaussian() * 0.05)
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, k = 2)
    val axis = Array.tabulate(d)(j => if (j < 2) 1.0 / math.sqrt(2.0) else 0.0)
    val cos = math.abs(m.components(0).zip(axis).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"top axis misaligned: cos=$cos")
    assert(m.eigenvalues(0) > m.eigenvalues(1), "eigenvalues must be descending")
  }

  test("deterministic under repartition (fixed-point Gram)") {
    val a = Pca.fit(embs, k = 8)
    val b = Pca.fit(embs.repartition(7), k = 8)
    assert(a.mean.sameElements(b.mean))
    a.components.zip(b.components).foreach { case (x, y) => assert(x.sameElements(y)) }
    assert(a.eigenvalues.sameElements(b.eigenvalues))
  }

  test("reconstruction error decreases with k; transform has k coords") {
    val m8 = Pca.fit(embs, k = 8)
    val m32 = Pca.fit(embs, k = 32)
    val e8 = Pca.reconstructionError(embs, m8)
    val e32 = Pca.reconstructionError(embs, m32)
    assert(e32 < e8, s"more components must reconstruct better: $e32 vs $e8")
    val t = Pca.transform(embs, m8)
    assert(t.select(size($"pca")).distinct().as[Int].head() == 8)
    assert(t.count() == embs.count())
  }

  test("whitening yields ~unit variance per coordinate") {
    val m = Pca.fit(embs, k = 4)
    val t = Pca.transform(embs, m, whiten = true)
      .select(posexplode($"pca").as(Seq("c", "x")))
    val vars = t.groupBy($"c").agg(variance($"x").as("v"))
      .collect().map(r => r.getDouble(1))
    vars.foreach(v => assert(v > 0.5 && v < 2.0, s"whitened variance off: ${vars.mkString(",")}"))
  }
}
