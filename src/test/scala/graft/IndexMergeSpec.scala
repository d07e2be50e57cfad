package graft

import graft.ops.{AnnIndex, DedupIndex, NearDupIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard consolidation across the three serving indexes: merge(A, B)
  * must leave A answering like a from-scratch build over the union
  * corpus (counts summed / postings unioned + re-capped / vectors
  * re-assigned), tombstones on either side honored, atomically
  * (staged generation + swap), with B untouched.
  */
class IndexMergeSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String) = {
    n += 1
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_merge").toString
    (dir, s"graft_test_idx_merge_$n")
  }

  private def mk(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def frontier(tbl: String): Set[(String, Long, Long)] =
    spark.table(tbl).select($"text_hash", $"n_dups", $"keep_id")
      .as[(String, Long, Long)].collect().toSet

  test("merge == build over the union corpus (counts summed, keepers min'd)") {
    val (dirA, tblA) = fresh()
    val (dirB, tblB) = fresh()
    val (dirU, tblU) = fresh()
    val a = mk(1L -> "shared page", 2L -> "only in a", 3L -> "SHARED  page")
    val b = mk(10L -> "shared page", 11L -> "only in b", 12L -> "only in b twice",
      13L -> "ONLY IN B TWICE")
    DedupIndex.build(a, dirA, tblA, nBuckets = 4)
    DedupIndex.build(b, dirB, tblB, nBuckets = 4)
    DedupIndex.merge(spark, tblA, dirA, tblB)
    DedupIndex.build(a.unionByName(b), dirU, tblU, nBuckets = 4)
    assert(frontier(tblA) == frontier(tblU),
      s"merged frontier != union build:\n merged=${frontier(tblA)}\n union=${frontier(tblU)}")
    // B untouched by the merge
    assert(frontier(tblB).map(_._1).size == 3)
  }

  test("probes after merge filter against BOTH shards' content") {
    val (dirA, tblA) = fresh()
    val (dirB, tblB) = fresh()
    DedupIndex.build(mk(1L -> "page alpha"), dirA, tblA, nBuckets = 4)
    DedupIndex.build(mk(2L -> "page beta"), dirB, tblB, nBuckets = 4)
    DedupIndex.merge(spark, tblA, dirA, tblB)
    val out = DedupIndex.filterNew(spark, tblA,
      mk(20L -> "page alpha", 21L -> "page beta", 22L -> "page gamma"))
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(22L))
  }

  test("tombstones on either side are honored: deleted content merges as absent") {
    val (dirA, tblA) = fresh()
    val (dirB, tblB) = fresh()
    DedupIndex.build(mk(1L -> "kept in a", 2L -> "deleted in a"), dirA, tblA, nBuckets = 4)
    DedupIndex.build(mk(10L -> "kept in b", 11L -> "deleted in b"), dirB, tblB, nBuckets = 4)
    assert(DedupIndex.delete(spark, tblA, Seq(2L).toDF("doc_id")) == 1L)
    assert(DedupIndex.delete(spark, tblB, Seq(11L).toDF("doc_id")) == 1L)
    DedupIndex.merge(spark, tblA, dirA, tblB)
    // the merged generation holds only live content, physically
    val hashes = frontier(tblA)
    assert(hashes.size == 2, s"expected 2 live hashes, got $hashes")
    // A's tombstone set is retired by the rewrite; deleted content re-ingests as new
    val out = DedupIndex.filterNew(spark, tblA,
      mk(30L -> "deleted in a", 31L -> "deleted in b", 32L -> "kept in a"))
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(30L, 31L))
  }

  test("zombie double-append rows collapse per side before counts sum") {
    val (dirA, tblA) = fresh()
    val (dirB, tblB) = fresh()
    DedupIndex.build(mk(1L -> "seed a"), dirA, tblA, nBuckets = 4)
    DedupIndex.build(mk(10L -> "shared twice"), dirB, tblB, nBuckets = 4)
    // simulate a crashed ingest's zombie double-append into A: the same
    // (hash, n_dups, keep_id) row written twice
    val survivors = DedupIndex.ingest(spark, tblA, mk(5L -> "shared twice"))
    assert(survivors.isEmpty == false)
    spark.table(tblA).filter($"keep_id" === 5L)
      .write.mode("append").format("parquet").insertInto(tblA)
    DedupIndex.merge(spark, tblA, dirA, tblB)
    val merged = frontier(tblA).filter(_._3 != 1L) // drop "seed a"
    // zombie collapsed: A contributes 1, B contributes 1 -> n_dups 2, keeper min(5, 10) = 5
    assert(merged == Set((merged.head._1, 2L, 5L)), s"zombie not collapsed: $merged")
  }

  // ---------------------------------------------------------- near-dup

  test("neardup merge: probe answers equal a build over the union corpus") {
    val (dirA, pfxA) = fresh(); val (dirB, pfxB) = fresh(); val (dirU, pfxU) = fresh()
    val a = mk(1L -> "the quick brown fox jumps over the lazy dog one",
      2L -> "completely different text about spark partitions and shuffles here")
    val b = mk(3L -> "the quick brown fox jumps over the lazy dog two",
      4L -> "another unrelated document body for the second shard entirely")
    val probe = mk(10L -> "the quick brown fox jumps over the lazy dog one",
      11L -> "nothing like anything indexed in either shard at all today")
    NearDupIndex.build(a, dirA, pfxA, nBuckets = 4)
    NearDupIndex.build(b, dirB, pfxB, nBuckets = 4)
    NearDupIndex.merge(spark, pfxA, dirA, pfxB)
    NearDupIndex.build(a.unionByName(b), dirU, pfxU, nBuckets = 4)
    def pairs(p: String) = NearDupIndex.probePairs(spark, p, probe, threshold = 0.5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs(pfxA) == pairs(pfxU),
      s"merged != union-built:\n merged=${pairs(pfxA)}\n union=${pairs(pfxU)}")
    assert(pairs(pfxA).nonEmpty, "sanity: the planted near-dup must pair")
  }

  test("neardup merge: cap re-applies on UNION sizes; drop is observable") {
    val (dirA, pfxA) = fresh(); val (dirB, pfxB) = fresh()
    // 5 copies per shard of the same boilerplate: each shard's bucket
    // holds 5 <= maxBucket=8, the union holds 10 > 8 -> dropped.
    val boiler = "subscribe to our newsletter for daily updates and offers"
    val a = mk((1L to 5L).map(i => i -> boiler): _*)
    val b = mk((11L to 15L).map(i => i -> boiler): _*)
    NearDupIndex.build(a, dirA, pfxA, nBuckets = 4, maxBucket = 8)
    NearDupIndex.build(b, dirB, pfxB, nBuckets = 4, maxBucket = 8)
    NearDupIndex.merge(spark, pfxA, dirA, pfxB, maxBucket = 8)
    val probe = mk(100L -> boiler)
    // no candidates from the dropped bucket...
    assert(NearDupIndex.probePairs(spark, pfxA, probe, threshold = 0.9).isEmpty)
    // ...but the probe is FLAGGED as under-covered, not silently novel
    val flagged = NearDupIndex.droppedBucketProbes(spark, pfxA, probe)
      .select($"doc_id").as[Long].collect().toSet
    assert(flagged == Set(100L), s"dropped-bucket probe not flagged: $flagged")
  }

  test("neardup merge: tombstones on either side are honored") {
    val (dirA, pfxA) = fresh(); val (dirB, pfxB) = fresh()
    val a = mk(1L -> "alpha document body with several words inside it")
    val b = mk(2L -> "beta document body with several words inside it too")
    NearDupIndex.build(a, dirA, pfxA, nBuckets = 4)
    NearDupIndex.build(b, dirB, pfxB, nBuckets = 4)
    assert(NearDupIndex.delete(spark, pfxB, Seq(2L).toDF("doc_id")) == 1L)
    NearDupIndex.merge(spark, pfxA, dirA, pfxB)
    val probe = mk(20L -> "alpha document body with several words inside it",
      21L -> "beta document body with several words inside it too")
    val partners = NearDupIndex.probePairs(spark, pfxA, probe, threshold = 0.9)
      .select($"doc_a").as[Long].collect().toSet
    assert(partners == Set(1L), s"tombstoned shard doc resurfaced: $partners")
  }

  // --------------------------------------------------------------- ann

  private def vecs(ids: Seq[Long], dim: Int = 16, seed: Int = 5) = {
    val rnd = new scala.util.Random(seed)
    val all = (0 until (ids.max.toInt + 1)).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    all.filter(t => ids.contains(t._1)).toDF("vec_id", "embedding")
  }

  private def annDir() =
    java.nio.file.Files.createTempDirectory("graft_ann_merge").toString

  test("ann merge: full-probe answers equal an index built on the union") {
    val ids = (0L until 200L)
    val dirA = annDir(); val dirB = annDir(); val dirU = annDir()
    AnnIndex.build(vecs(ids.filter(_ % 2 == 0)), dirA, nClusters = 4, iters = 2)
    AnnIndex.build(vecs(ids.filter(_ % 2 == 1)), dirB, nClusters = 4, iters = 2)
    assert(AnnIndex.merge(spark, dirA, dirB) == 100L)
    AnnIndex.build(vecs(ids), dirU, nClusters = 4, iters = 2)
    val q = vecs(0L until 10L)
    def top(d: String) = AnnIndex.topK(spark, d, q, k = 5, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    // both are exact at full probe depth (raw-vector scoring), so they
    // agree even though the two indexes cluster differently
    assert(top(dirA) == top(dirU))
  }

  test("ann merge: merged vectors enter the PQ sidecar; other's tombstones honored") {
    val ids = (0L until 120L)
    val dirA = annDir(); val dirB = annDir()
    AnnIndex.build(vecs(ids.filter(_ < 60)), dirA, nClusters = 4, iters = 2)
    AnnIndex.buildPq(spark, dirA, m = 4, codes = 8, iters = 2)
    AnnIndex.build(vecs(ids.filter(_ >= 60)), dirB, nClusters = 4, iters = 2)
    // plant a takedown on the B shard before the merge
    AnnIndex.delete(spark, dirB, Seq(61L).toDF("vec_id"))
    AnnIndex.merge(spark, dirA, dirB)
    // pqcodes holds the merged rows (minus the tombstoned one)
    val pqIds = spark.read.parquet(AnnIndex.pqcodesPath(dirA))
      .filter($"vec_id" >= 60).select($"vec_id").as[Long].collect().toSet
    assert(pqIds == ids.filter(i => i >= 60 && i != 61L).toSet)
    // a merged vector is its own twin's nearest neighbor through BOTH APIs
    val q = vecs(Seq(70L))
    val viaExact = AnnIndex.topK(spark, dirA, q, k = 119, nProbe = 4)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(viaExact.contains(71L) && !viaExact.contains(61L))
    val viaPq = AnnIndex.topKPq(spark, dirA, q, k = 10, nProbe = 4, refine = 200)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(viaPq.subsetOf(viaExact) && !viaPq.contains(61L))
  }

  test("ann merge: metadata-incompatible shards fail loudly") {
    val dirA = annDir(); val dirB = annDir()
    val withMeta = vecs(0L until 50L).withColumn("label", ($"vec_id" % 3).cast("int"))
    AnnIndex.build(withMeta, dirA, nClusters = 4, iters = 1, metaCols = Seq("label"))
    AnnIndex.build(vecs(50L until 100L), dirB, nClusters = 4, iters = 1)
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.merge(spark, dirA, dirB)
    }
    assert(ex.getMessage.contains("label"), ex.getMessage)
  }

  test("merge is reader-atomic: a probe mid-merge reads the old or new generation") {
    val (dirA, tblA) = fresh()
    val (dirB, tblB) = fresh()
    DedupIndex.build(mk(1L -> "page one"), dirA, tblA, nBuckets = 4)
    DedupIndex.build(mk(2L -> "page two"), dirB, tblB, nBuckets = 4)
    // SwapHooks lets the test interleave a probe between the staged
    // write and the swap — the probe must see the OLD complete index.
    var seenDuringWrite: Option[Set[Long]] = None
    graft.sources.SwapHooks.preSwap = { _ =>
      seenDuringWrite = Some(DedupIndex.filterNew(spark, tblA,
        mk(20L -> "page one", 21L -> "page two"))
        .select($"doc_id").as[Long].collect().toSet)
    }
    try DedupIndex.merge(spark, tblA, dirA, tblB)
    finally graft.sources.SwapHooks.preSwap = _ => ()
    // during the merge: old generation = only "page one" indexed
    assert(seenDuringWrite.contains(Set(21L)), s"mid-merge probe saw $seenDuringWrite")
    // after: both filtered
    assert(DedupIndex.filterNew(spark, tblA,
      mk(30L -> "page one", 31L -> "page two")).isEmpty)
  }
}
