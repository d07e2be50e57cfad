package graft

import graft.ops.{Dedup, NearDupIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH near-dup index: cross-corpus probe semantics
  * (verified exact-Jaccard pairs), novelty filtering, append/ingest
  * visibility, the maxBucket posting cap, compaction, and the bucketed
  * scan contract (index sides read bucketed — no index-sized exchange).
  */
class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String) = {
    n += 1
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_idx").toString
    (dir, s"graft_test_nd_idx_$n")
  }

  private def mk(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // 60 distinct tokens; dropping/adding a tail token keeps J >= 0.9
  private val base: String = (1 to 60).map(i => s"tok$i").mkString(" ")

  test("probePairs: verified cross pairs only, exact integer evidence") {
    val (dir, pfx) = fresh()
    NearDupIndex.build(
      mk(1L -> base, 2L -> "entirely different words here repeated thrice over and over again"),
      dir, pfx, nBuckets = 4)
    val probe = mk(
      10L -> (base + " extra"),         // J = 58/59 vs doc 1
      11L -> s"  ${base.toUpperCase} ", // J = 1.0 vs doc 1 (normalization)
      12L -> "no overlap with anything in the index at all whatsoever truly none")
    val got = NearDupIndex.probePairs(spark, pfx, probe, threshold = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 58L, 59L), (1L, 11L, 58L, 58L)))
    // the exact evidence matches a from-scratch shingle computation
    val j = Dedup.jaccard(Dedup.shingleSet(base), Dedup.shingleSet(base + " extra"))
    assert(math.abs(j - 58.0 / 59.0) < 1e-12)
  }

  test("filterNovel keeps only rows with no index near-dup") {
    val (dir, pfx) = fresh()
    NearDupIndex.build(mk(1L -> base), dir, pfx, nBuckets = 4)
    val probe = mk(10L -> (base + " extra"), 12L -> "fresh content nothing like the seed corpus")
    assert(NearDupIndex.filterNovel(spark, pfx, probe)
      .select($"doc_id").as[Long].collect().toSet == Set(12L))
  }

  test("delete: tombstoned doc never probed back; compact retires postings and shingles") {
    val (dir, pfx) = fresh()
    // long enough that "other + one token" stays above J = 0.9
    val other = (1 to 60).map(i => s"sail$i").mkString(" ")
    NearDupIndex.build(mk(1L -> base, 2L -> other), dir, pfx, nBuckets = 4)
    assert(NearDupIndex.delete(spark, pfx, Seq(1L).toDF("doc_id")) == 1L)
    // no probe path returns doc 1: pairs exclude it, novelty treats its
    // content as novel again
    val probe = mk(10L -> (base + " extra"), 11L -> (other + " more"))
    assert(NearDupIndex.probePairs(spark, pfx, probe, threshold = 0.9)
      .select($"doc_a").as[Long].collect().toSet == Set(2L))
    assert(NearDupIndex.filterNovel(spark, pfx, probe, threshold = 0.9)
      .select($"doc_id").as[Long].collect().toSet == Set(10L))
    // re-ingest of the deleted content (fresh id) behaves as new
    assert(NearDupIndex.ingest(spark, pfx, mk(50L -> base))
      .select($"doc_id").as[Long].collect().toSet == Set(50L))
    assert(NearDupIndex.probePairs(spark, pfx, mk(60L -> base))
      .select($"doc_a").as[Long].collect().toSet == Set(50L))
    // compact physically retires doc 1 from both tables and clears the set
    NearDupIndex.compact(spark, pfx, dir)
    assert(spark.table(NearDupIndex.bucketsTable(pfx))
      .filter($"doc_id" === 1L).isEmpty)
    assert(spark.table(NearDupIndex.shinglesTable(pfx))
      .filter($"doc_id" === 1L).isEmpty)
    assert(!spark.catalog.tableExists(NearDupIndex.tombstonesTable(pfx)))
    // post-compact: probe 10 pairs with the re-ingested doc 50 (same
    // content the deleted doc 1 had), never with 1 itself
    assert(NearDupIndex.probePairs(spark, pfx, probe, threshold = 0.9)
      .select($"doc_a").as[Long].collect().toSet == Set(2L, 50L))
  }

  test("append makes new docs probe-visible; ingest survives redelivery via self-match") {
    val (dir, pfx) = fresh()
    NearDupIndex.build(mk(1L -> base), dir, pfx, nBuckets = 4)
    NearDupIndex.append(spark, pfx, mk(2L -> "appended page about gardening tips and tools"))
    assert(NearDupIndex.probePairs(
      spark, pfx, mk(20L -> "appended page about gardening tips and tools"))
      .select($"doc_a").as[Long].collect().toSeq == Seq(2L))
    // ingest: batch-internal near-dups keep min id, survivors appended
    val batch = mk(
      30L -> "novel essay on tide pools and their inhabitants near rocky shores",
      31L -> "novel essay on tide pools and their inhabitants near ROCKY shores",
      32L -> base) // near-dups the seed -> dropped
    val kept = NearDupIndex.ingest(spark, pfx, batch)
    assert(kept.select($"doc_id").as[Long].collect().toSet == Set(30L))
    // full redelivery: every row now self-matches the index -> empty
    assert(NearDupIndex.ingest(spark, pfx, batch).isEmpty)
  }

  test("maxBucket cap: a boilerplate bucket is dropped loudly, not exploded") {
    val (dir, pfx) = fresh()
    // 70 identical docs agree on EVERY band -> all their buckets exceed
    // maxBucket=64 and the build drops them; one normal doc stays.
    val boiler = (1L to 70L).map(i => i -> "cookie banner accept all cookies to continue reading")
    NearDupIndex.build(mk(boiler :+ (100L -> base): _*), dir, pfx, nBuckets = 4)
    val probe = mk(
      200L -> "cookie banner accept all cookies to continue reading",
      201L -> base)
    val got = NearDupIndex.probePairs(spark, pfx, probe)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 201L)), s"boilerplate bucket must not produce candidates: $got")
    // the dropped buckets are OBSERVABLE: the sidecar is non-empty, the
    // boilerplate probe is flagged (its answer may under-report), the
    // fully-covered probe is not
    assert(spark.table(NearDupIndex.droppedTable(pfx)).count() > 0)
    val flagged = NearDupIndex.droppedBucketProbes(spark, pfx, probe)
      .select($"doc_id", $"n_dropped").as[(Long, Long)].collect().toMap
    assert(flagged.contains(200L) && flagged(200L) >= 1L,
      s"dropped-bucket probe must be flagged: $flagged")
    assert(!flagged.contains(201L), s"covered probe must not be flagged: $flagged")
    // compact refreshes the sidecar and keeps the flagging
    NearDupIndex.compact(spark, pfx, dir)
    assert(NearDupIndex.droppedBucketProbes(spark, pfx, probe)
      .filter($"doc_id" === 200L).count() == 1)
  }

  test("compact: append-grown files collapse, answers identical, buckets still bucketed") {
    val (dir, pfx) = fresh()
    NearDupIndex.build(mk(1L -> base), dir, pfx, nBuckets = 4)
    (0 until 4).foreach { b =>
      NearDupIndex.append(spark, pfx,
        mk((10L + b) -> s"unique page number $b about topic ${"xyz" * (b + 1)} and more"))
    }
    def files(sub: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count { st =>
          st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
        }
    }
    val before = files("buckets") + files("shingles")
    val probe = mk(50L -> (base + " extra"), 51L -> "unique page number 2 about topic xyzxyzxyz and more")
    val want = NearDupIndex.probePairs(spark, pfx, probe)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.map(p => (p._1, p._2)) == Set((1L, 50L), (12L, 51L)))
    val after = NearDupIndex.compact(spark, pfx, dir)
    assert(after < before, s"compact: $before -> $after files")
    assert(NearDupIndex.probePairs(spark, pfx, probe)
      .as[(Long, Long, Long, Long)].collect().toSet == want)
    // both index scans still report bucketed reads after the swap —
    // under the shuffled join shape the layout exists for (a tiny test
    // index would otherwise broadcast, which bypasses bucketing)
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = NearDupIndex.probePairs(spark, pfx, probe)
        .queryExecution.executedPlan.toString
      assert("SelectedBucketsCount".r.findAllIn(plan).size >= 2,
        s"index scans lost bucketing after compact:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
