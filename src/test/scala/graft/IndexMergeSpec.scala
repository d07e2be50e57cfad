package graft

import graft.ops.DedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard consolidation for the persisted dedup index: merge(A, B)
  * must leave A's frontier equal to a from-scratch build over the
  * union corpus — counts summed, keepers min'd, tombstones on either
  * side honored — atomically (staged generation + swap), with B
  * untouched.
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
