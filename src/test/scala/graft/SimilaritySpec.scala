package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force topK matches naive computation") {
    val sample = embs.limit(100).cache()
    val rows = sample.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val got = Similarity.topK(sample, sample.filter($"vec_id" < 5), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
      .toMap

    rows.filter(_._1 < 5).foreach { case (qid, qv) =>
      val want = rows
        .filter(_._1 != qid)
        .map { case (vid, v) => (Similarity.cosine(qv, v), vid) }
        .sortBy { case (s, vid) => (-s, vid) }
        .take(3)
        .map(_._2)
      val gotIds = (1 to 3).map(rk => got((qid, rk)))
      assert(gotIds == want.toSeq, s"query $qid: got $gotIds want ${want.toSeq}")
    }
  }

  test("rankTopK (bounded heaps) == global window ranking, including score ties") {
    // Coarse scores force many exact ties; the heap's eviction rule
    // (score desc, id asc) must reproduce the window's total order.
    val rnd = new scala.util.Random(7)
    val rows = (for (q <- 0L until 5L; _ <- 0 until 300)
      yield (q, rnd.nextInt(500).toLong, math.floor(rnd.nextDouble() * 12) / 12.0))
      .distinct
    val df = rows.toDF("query_id", "neighbor_id", "score").repartition(13)
    val got = Similarity.rankTopK(df, 10)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id")
    val want = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"bounded-heap ranking diverged from window ranking:\n${got.diff(want)}\n${want.diff(got)}")
  }

  test("ANN recall@10 against exact topK") {
    // This corpus's nearest neighbors sit at cosine ~0.3-0.5 (~60-70
    // degrees) — the hard regime for hyperplane LSH — so use short
    // signatures + many tables, matched to the geometry.
    val exact = Similarity.topK(embs, embs.limit(50), k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(embs, embs.limit(50), k = 10, tables = 32, bits = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.7, s"ANN recall@10 = $recall")
  }

  test("embedding near-dup finds seeded duplicates, never all-pairs") {
    // Seed 10 exact-duplicate vectors with new ids.
    val dups = embs.limit(10).select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label")
    val corpus = embs.unionByName(dups)
    val pairs = Similarity.embeddingNearDuplicates(corpus, threshold = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val want = (0L until 10L).map(i => (i, i + 100000L)).toSet
    assert(want.subsetOf(pairs), s"missing: ${want.diff(pairs)}")
    // Nothing else in this corpus is near-identical (max cosine ~0.5).
    assert(pairs.size == want.size, s"unexpected pairs: ${pairs.diff(want)}")
  }

  test("empty corpus: ANN and near-dup return empty, no exception") {
    val empty = embs.filter($"vec_id" < 0)
    assert(Similarity.annTopK(empty, embs.limit(3), k = 5).isEmpty)
    assert(Similarity.embeddingNearDuplicates(empty).isEmpty)
    assert(Similarity.crossNearDuplicates(empty, embs.limit(3)).isEmpty)
  }

  test("cross-corpus near-dup: finds exactly the planted benchmark matches") {
    // Benchmark = exact copies of 10 corpus vectors under new ids; the
    // cross search must find exactly those 10 (corpus id, bench id)
    // pairs — nothing intra-corpus (it never compares A to A), nothing
    // else cross (natural max cosine ~0.5 < 0.99).
    val bench = embs.limit(10)
      .select(($"vec_id" + 500000L).as("vec_id"), $"embedding", $"label")
    val pairs = Similarity.crossNearDuplicates(embs, bench, threshold = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val want = (0L until 10L).map(i => (i, i + 500000L)).toSet
    assert(pairs == want, s"diff: +${pairs.diff(want)} -${want.diff(pairs)}")
  }

  test("ragged corpus vector longer than query does not throw in topK") {
    val qs = Seq((0L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq((1L, Seq(1f, 0f, 3f, 4f)), (2L, Seq(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.topK(corpus, qs, k = 2)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toMap
    assert(got.size == 2) // both corpus vectors scored, prefix-truncated
  }

  test("cosine kernel: unit-norm invariance and self-similarity") {
    val a = Seq(1.0f, 2.0f, 3.0f)
    assert(math.abs(Similarity.cosine(a, a) - 1.0) < 1e-12)
    assert(math.abs(Similarity.cosine(a, a.map(_ * 5))) - 1.0 < 1e-12)
    assert(math.abs(Similarity.cosine(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
  }
}
