package graft

import graft.ops.{AnnIndex, DedupIndex, NearDupIndex}
import org.apache.spark.sql.functions._

/** End-to-end serving loop for each persisted index — the cadence a
  * real deployment runs, in order, with the observable contract
  * asserted after every step: nightly build → live ingest → probes →
  * takedown → compact (physical retirement) → rebuild (fresh
  * generation). The per-step behaviors are spec'd individually
  * elsewhere; this suite pins their COMPOSITION, where state from one
  * step (tombstones, stream markers, sidecar files) can corrupt the
  * next. [[graft.ops.AnnIndex.stats]]-style snapshots are asserted
  * alongside, so the operator-facing counters track the lifecycle too.
  */
class ServingLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def vecs(ids: Range, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    ids.map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("AnnIndex lifecycle: build -> stream -> takedown -> compact -> rebuild") {
    val dir = tmpDir("graft_life_ann")
    val corpus = vecs(0 until 200, seed = 1)

    // nightly build + PQ sidecar
    AnnIndex.build(corpus, dir, nClusters = 8, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    val s0 = AnnIndex.stats(spark, dir)
    assert(s0.cells == 8 && s0.rows == 200 && s0.hasPqSidecar && s0.tombstones == 0)

    // live ingest: a streamed batch planting an identical twin of vec 5
    val twin = corpus.filter($"vec_id" === 5L)
      .select(lit(9005L).as("vec_id"), $"embedding")
    assert(graft.streaming.StreamingAnnIngest.appendBatch(dir, twin, batchId = 0L))
    val q5 = corpus.filter($"vec_id" === 5L)
    def top1(api: String): Long = {
      val df =
        if (api == "exact") AnnIndex.topK(spark, dir, q5, k = 1, nProbe = 8)
        else AnnIndex.topKPq(spark, dir, q5, k = 1, nProbe = 8)
      df.select($"neighbor_id").as[Long].head()
    }
    assert(top1("exact") == 9005L && top1("pq") == 9005L,
      "streamed twin must be rank-1 through BOTH probe APIs")
    assert(AnnIndex.stats(spark, dir).rows == 201)

    // takedown of the streamed twin; both APIs stop returning it, and
    // a redelivered takedown is a counted-once no-op
    assert(AnnIndex.delete(spark, dir, Seq(9005L).toDF("vec_id")) == 1L)
    assert(AnnIndex.delete(spark, dir, Seq(9005L).toDF("vec_id")) == 0L)
    assert(top1("exact") != 9005L && top1("pq") != 9005L)
    assert(AnnIndex.stats(spark, dir).tombstones == 1)

    // compact: physical retirement, probes byte-identical around it
    val before = AnnIndex.topK(spark, dir, corpus.filter($"vec_id" < 10), k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSet
    AnnIndex.compact(spark, dir)
    val s1 = AnnIndex.stats(spark, dir)
    assert(s1.rows == 200 && s1.tombstones == 0, s"retired physically: $s1")
    assert(AnnIndex.topK(spark, dir, corpus.filter($"vec_id" < 10), k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSet == before)

    // rebuild: fresh generation — the takedown does not carry over, a
    // re-ingest of the same id is live again; sidecar must be re-made
    AnnIndex.build(corpus.unionByName(twin), dir, nClusters = 8, iters = 2)
    assert(top1("exact") == 9005L, "fresh generation: old tombstone must not hide the twin")
    assert(!AnnIndex.stats(spark, dir).hasPqSidecar, "rebuild retires the PQ sidecar")
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    assert(top1("pq") == 9005L)
  }

  test("DedupIndex lifecycle: build -> ingest -> takedown -> compact -> rebuild") {
    val dir = tmpDir("graft_life_dedup")
    val tbl = "graft_life_dedup"
    val seed = Seq((1L, "alpha page"), (2L, "beta page")).toDF("doc_id", "text")
    DedupIndex.build(seed, dir, tbl, nBuckets = 2)

    // ingest: new content admitted once; the duplicate batch is empty
    val batch = Seq((10L, "gamma page"), (11L, "alpha page")).toDF("doc_id", "text")
    assert(DedupIndex.ingest(spark, tbl, batch).select($"doc_id").as[Long].collect().toSet
      == Set(10L))
    assert(DedupIndex.ingest(spark, tbl, batch).count() == 0, "redelivery is a no-op")
    assert(DedupIndex.stats(spark, tbl).hashes == 3)

    // takedown of keeper 1 ("alpha page"): content counts as unseen,
    // redelivered takedown is a counted-once no-op
    assert(DedupIndex.delete(spark, tbl, Seq(1L).toDF("doc_id")) == 1L)
    assert(DedupIndex.delete(spark, tbl, Seq(1L).toDF("doc_id")) == 0L)
    val reIngest = Seq((20L, "alpha page")).toDF("doc_id", "text")
    assert(DedupIndex.filterNew(spark, tbl, reIngest).count() == 1,
      "taken-down content must be treated as new")

    // compact: tombstones retired physically; the probe answer for
    // LIVE content is unchanged
    DedupIndex.compact(spark, tbl, dir)
    val s = DedupIndex.stats(spark, tbl)
    assert(s.hashes == 2 && s.tombstones == 0, s"alpha retired: $s")
    assert(DedupIndex.filterNew(spark, tbl,
      Seq((30L, "gamma page")).toDF("doc_id", "text")).count() == 0)

    // rebuild: fresh generation over a new corpus
    DedupIndex.build(Seq((5L, "delta page")).toDF("doc_id", "text"), dir, tbl, nBuckets = 2)
    val s2 = DedupIndex.stats(spark, tbl)
    assert(s2.hashes == 1 && s2.tombstones == 0)
  }

  test("NearDupIndex lifecycle: build -> ingest -> takedown -> compact -> rebuild") {
    val dir = tmpDir("graft_life_nd")
    val pfx = "graft_life_nd"
    val t1 = "the quick brown fox jumps over the lazy dog tonight"
    val t2 = "spark engines compact bucketed layouts into fresh generations"
    NearDupIndex.build(Seq((1L, t1)).toDF("doc_id", "text"), dir, pfx, nBuckets = 2)

    // ingest: novel text admitted, near-dup of the index filtered
    val batch = Seq((10L, t2), (11L, t1)).toDF("doc_id", "text")
    assert(NearDupIndex.ingest(spark, pfx, batch).select($"doc_id").as[Long].collect().toSet
      == Set(10L))
    assert(NearDupIndex.stats(spark, pfx).docs == 2)

    // takedown of doc 1: its pairs vanish, a re-crawl of t1 is novel
    assert(NearDupIndex.delete(spark, pfx, Seq(1L).toDF("doc_id")) == 1L)
    assert(NearDupIndex.delete(spark, pfx, Seq(1L).toDF("doc_id")) == 0L)
    val probe1 = Seq((20L, t1)).toDF("doc_id", "text")
    assert(NearDupIndex.probePairs(spark, pfx, probe1).count() == 0)
    assert(NearDupIndex.stats(spark, pfx).tombstones == 1)

    // compact retires doc 1 physically; live pairs unchanged
    NearDupIndex.compact(spark, pfx, dir)
    val s = NearDupIndex.stats(spark, pfx)
    assert(s.docs == 1 && s.tombstones == 0, s"doc 1 retired: $s")
    assert(NearDupIndex.probePairs(spark, pfx, Seq((21L, t2)).toDF("doc_id", "text"))
      .select($"doc_a").as[Long].head() == 10L)

    // rebuild: fresh generation; prior takedown does not carry over
    NearDupIndex.build(Seq((1L, t1)).toDF("doc_id", "text"), dir, pfx, nBuckets = 2)
    assert(NearDupIndex.probePairs(spark, pfx, probe1)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet == Set((1L, 20L)))
  }

  test("stats counters track fragmentation toward the compact trigger") {
    val dir = tmpDir("graft_life_frag")
    val corpus = vecs(0 until 100, seed = 9)
    AnnIndex.build(corpus, dir, nClusters = 4, iters = 2)
    val f0 = AnnIndex.stats(spark, dir).dataFiles
    (0 until 3).foreach(b =>
      AnnIndex.append(spark, dir, vecs(1000 + b * 5 until 1005 + b * 5, seed = 10 + b)))
    val f1 = AnnIndex.stats(spark, dir).dataFiles
    assert(f1 > f0, "appends fragment")
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.stats(spark, dir).dataFiles < f1, "compact collapses")
  }
}
