package graft

import graft.ops.{Clustering, Similarity}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kmeans: deterministic, covers all points, k cells") {
    val (a1, c1) = Clustering.kmeans(embs, k = 8, iters = 3)
    val (a2, c2) = Clustering.kmeans(embs.repartition(7), k = 8, iters = 3)
    assert(a1.count() == embs.count())
    assert(c1.length == 8 && c1.zip(c2).forall { case (x, y) => x.sameElements(y) })
    val m1 = a1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m2 = a2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m1 == m2, "clustering depends on partitioning")
    assert(a1.select($"cluster").distinct().count() >= 2, "degenerate clustering")
  }

  test("ivf top-k: recall floor vs exact, never all-pairs") {
    val queries = embs.filter($"vec_id" < 20)
    val exact = Similarity.topK(embs, queries, k = 10)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Clustering.ivfTopK(embs, queries, k = 10, nClusters = 8, nProbe = 4)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
    // Probing 4 of 8 cells: candidate work is about half the corpus per
    // query, strictly less than brute force.
    assert(ivf.size <= exact.size)
  }
}
