package graft

import graft.ops.{ProductQuantization => PQ, Similarity}
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codebooks: deterministic under repartition, right shape") {
    val b1 = PQ.trainCodebooks(embs, m = 8, codes = 16, iters = 3)
    val b2 = PQ.trainCodebooks(embs.repartition(7), m = 8, codes = 16, iters = 3)
    assert(b1.length == 8 && b1.forall(_.length == 16))
    assert(b1.forall(_.forall(_.length == 8))) // 64 dims / 8 subs
    for (s <- b1.indices; c <- b1(s).indices)
      assert(b1(s)(c).sameElements(b2(s)(c)), s"codebook ($s,$c) depends on partitioning")
  }

  test("encode: one code per subspace, in range, deterministic") {
    val books = PQ.trainCodebooks(embs, m = 8, codes = 16, iters = 3)
    val enc = PQ.encode(embs, books)
    assert(enc.count() == embs.count())
    val bad = enc.select(explode($"pq_codes").as("c"))
      .filter($"c" < 0 || $"c" >= 16).count()
    assert(bad == 0L)
    val e1 = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val e2 = PQ.encode(embs.repartition(5), books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(e1 == e2)
  }

  test("training reduces reconstruction error vs 1-code baseline") {
    // One code per subspace = the global subspace mean: the weakest
    // possible codebook. 16 trained codes must reconstruct strictly
    // better — this is what "training worked" means numerically.
    val trivial = PQ.trainCodebooks(embs, m = 8, codes = 1, iters = 3)
    val trained = PQ.trainCodebooks(embs, m = 8, codes = 16, iters = 3)
    val e0 = PQ.reconstructionError(embs, trivial)
    val e1 = PQ.reconstructionError(embs, trained)
    assert(e1 < e0 * 0.9, s"training barely helped: $e1 vs baseline $e0")
  }

  test("pqTopK: exact scores on emitted rows, ranks contiguous, recall floor") {
    val queries = embs.filter($"vec_id" < 20)
    val pq = PQ.pqTopK(embs, queries, k = 10, m = 16, codes = 32, iters = 3, refine = 40)
    val rows = pq.collect()
    // Shape: every query has ranks 1..10, no self-matches.
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 20L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to 10L), s"ranks broken for $q")
      assert(rs.forall(_.getLong(1) != q), s"self-match for $q")
    }
    // Emitted scores are the EXACT cosines (refine step), so each row
    // can be checked against the raw vectors.
    val vecs = embs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      val expect = math.round(Similarity.cosine(vecs(r.getLong(0)), vecs(r.getLong(1))) * 1e4) / 1e4
      assert(math.abs(r.getDouble(3) - expect) < 1e-9, s"score not exact cosine: $r")
    }
    // Recall floor vs exact top-10 (deterministic pipeline, hard floor).
    val exact = Similarity.topK(embs, queries, k = 10)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.7, s"PQ+refine recall too low: $recall")
  }

  test("ivfPqTopK: probe-restricted scan keeps a recall floor, exact scores") {
    val queries = embs.filter($"vec_id" < 20)
    val got = PQ.ivfPqTopK(embs, queries, k = 10,
      nClusters = 8, nProbe = 4, m = 16, codes = 32, iters = 3, refine = 60)
    val rows = got.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 20L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to 10L), s"ranks broken for $q")
    }
    val vecs = embs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      val expect = math.round(Similarity.cosine(vecs(r.getLong(0)), vecs(r.getLong(1))) * 1e4) / 1e4
      assert(math.abs(r.getDouble(3) - expect) < 1e-9, s"score not exact cosine: $r")
    }
    val exact = Similarity.topK(embs, queries, k = 10)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(pqSet).size.toDouble / exact.size
    // Probing 4 of 8 cells THEN PQ-quantizing is the double-approximate
    // path; the floor reflects IVF's hard regime on this far-neighbor
    // corpus (cosine 0.3-0.5), same as ClusteringSpec's IVF floor.
    assert(recall >= 0.5, s"IVF-PQ recall too low: $recall")
  }

  test("ragged dimension split: m that does not divide d") {
    // 64 dims over m=6 -> subspaces of width ceil(64/6)=11, last = 9.
    val books = PQ.trainCodebooks(embs, m = 6, codes = 4, iters = 1)
    assert(books.length == 6)
    assert(books.take(5).forall(_.forall(_.length == 11)))
    assert(books.last.forall(_.length == 9))
    val enc = PQ.encode(embs, books)
    assert(enc.select(size($"pq_codes")).distinct().as[Int].head() == 6)
  }
}
