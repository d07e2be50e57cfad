package graft

import graft.ops.{AnnIndex, ProductQuantization, Similarity}
import org.apache.spark.sql.functions._

/** Parity across both sides of the ANN family's broadcast guard: every
  * `broadcast()` hint on a query-batch frame (probe AND refine stages)
  * is guarded by [[Similarity.BroadcastGuardBytes]]; forcing the guard
  * to 0 plans the same operators as shuffle joins, and the emitted
  * rows must be identical — the guard changes the PLAN, never the
  * answer. This is the contract that lets a 100k-query batch run the
  * exact same code path, just without an executor-OOM-sized broadcast.
  */
class RefineGuardSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  private def bothSides(run: => Set[Seq[Any]]): (Set[Seq[Any]], Set[Seq[Any]]) = {
    val dflt = Similarity.BroadcastGuardBytes
    val hinted = run
    Similarity.BroadcastGuardBytes = 0L
    try { (hinted, run) } finally Similarity.BroadcastGuardBytes = dflt
  }

  test("AnnIndex.topK and topKPq: guarded and shuffle paths emit identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_guard_ann").toString
    val e = vecs(200, seed = 5)
    AnnIndex.build(e, dir, nClusters = 4, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    val q = vecs(6, seed = 6).select(($"vec_id" + 9000L).as("vec_id"), $"embedding")
    val (a1, a2) = bothSides(
      AnnIndex.topK(spark, dir, q, k = 3, nProbe = 3).collect().map(_.toSeq).toSet)
    assert(a1 == a2 && a1.nonEmpty, s"topK parity across the guard: $a1 vs $a2")
    val (p1, p2) = bothSides(
      AnnIndex.topKPq(spark, dir, q, k = 3, nProbe = 3).collect().map(_.toSeq).toSet)
    assert(p1 == p2 && p1.nonEmpty, s"topKPq parity across the guard: $p1 vs $p2")
  }

  test("pqTopK and ivfPqTopK: guarded and shuffle paths emit identical rows") {
    val e = vecs(150, seed = 9)
    val q = vecs(5, seed = 10).select(($"vec_id" + 9000L).as("vec_id"), $"embedding")
    val (a1, a2) = bothSides(
      ProductQuantization.pqTopK(e, q, k = 3, m = 4, codes = 8, iters = 2)
        .collect().map(_.toSeq).toSet)
    assert(a1 == a2 && a1.nonEmpty, s"pqTopK parity across the guard: $a1 vs $a2")
    val (i1, i2) = bothSides(
      ProductQuantization.ivfPqTopK(e, q, k = 3, nClusters = 4, m = 4, codes = 8, iters = 2)
        .collect().map(_.toSeq).toSet)
    assert(i1 == i2 && i1.nonEmpty, s"ivfPqTopK parity across the guard: $i1 vs $i2")
  }

  test("Similarity.annTopK: guarded and shuffle paths emit identical rows") {
    val e = vecs(200, seed = 13)
    val q = vecs(5, seed = 14).select(($"vec_id" + 9000L).as("vec_id"), $"embedding")
    val (a1, a2) = bothSides(
      Similarity.annTopK(e, q, k = 3).collect().map(_.toSeq).toSet)
    assert(a1 == a2, s"annTopK parity across the guard: $a1 vs $a2")
  }

  // Probe-path TOMBSTONE anti-joins ride the same guard as the
  // query-batch hints ("takedown-sized by nature" is a convention, not
  // a bound — a court-ordered million-doc takedown must not OOM every
  // probe). Guard at 0 forces the shuffle side; rows must not move.

  private def docsOf(ids: Range) = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    ids.map { i =>
      (i.toLong, (0 until 5).map(j => words((i + j * j) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("AnnIndex.topK + Bm25Index.topDocs with tombstones: guard parity") {
    val annDir = java.nio.file.Files.createTempDirectory("graft_guard_tann").toString
    val e = vecs(200, seed = 17)
    AnnIndex.build(e, annDir, nClusters = 4, iters = 2)
    AnnIndex.delete(spark, annDir, spark.range(0, 200, 3).select($"id".as("vec_id")))
    val q = vecs(6, seed = 18).select(($"vec_id" + 9000L).as("vec_id"), $"embedding")
    val (a1, a2) = bothSides(
      AnnIndex.topK(spark, annDir, q, k = 3, nProbe = 4).collect().map(_.toSeq).toSet)
    assert(a1 == a2 && a1.nonEmpty, s"topK tombstone-guard parity: $a1 vs $a2")

    val bmDir = java.nio.file.Files.createTempDirectory("graft_guard_tbm").toString
    val d = docsOf(0 until 80)
    graft.ops.Bm25Index.build(d, bmDir, nTb = 4)
    graft.ops.Bm25Index.delete(spark, bmDir,
      spark.range(0, 80, 4).select($"id".as("doc_id")))
    val bq = Seq((900L, "alpha delta"), (901L, "zeta beta")).toDF("query_id", "text")
    val (b1, b2) = bothSides(
      graft.ops.Bm25Index.topDocs(spark, bmDir, bq, k = 5).collect().map(_.toSeq).toSet)
    assert(b1 == b2 && b1.nonEmpty, s"bm25 tombstone-guard parity: $b1 vs $b2")
  }

  test("DedupIndex.filterNew + NearDupIndex.probePairs with tombstones: guard parity") {
    val d = docsOf(0 until 60)
    val dedupDir = java.nio.file.Files.createTempDirectory("graft_guard_tdd").toString
    graft.ops.DedupIndex.build(d, dedupDir, "graft_guard_tdd_t", nBuckets = 4)
    graft.ops.DedupIndex.delete(spark, "graft_guard_tdd_t",
      spark.range(0, 60, 5).select($"id".as("doc_id")))
    val batch = docsOf(30 until 90)
    val (d1, d2) = bothSides(
      graft.ops.DedupIndex.filterNew(spark, "graft_guard_tdd_t", batch)
        .collect().map(_.toSeq).toSet)
    assert(d1 == d2 && d1.nonEmpty, s"filterNew tombstone-guard parity")

    val ndDir = java.nio.file.Files.createTempDirectory("graft_guard_tnd").toString
    graft.ops.NearDupIndex.build(d, ndDir, "graft_guard_tnd_t", nBuckets = 4)
    graft.ops.NearDupIndex.delete(spark, "graft_guard_tnd_t",
      spark.range(0, 60, 5).select($"id".as("doc_id")))
    val probe = docsOf(0 until 30).select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val (n1, n2) = bothSides(
      graft.ops.NearDupIndex.probePairs(spark, "graft_guard_tnd_t", probe)
        .collect().map(_.toSeq).toSet)
    assert(n1 == n2 && n1.nonEmpty, s"probePairs tombstone-guard parity")
  }
}
