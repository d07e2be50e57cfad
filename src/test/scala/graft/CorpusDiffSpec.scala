package graft

import graft.ops.{CorpusDiff, Curation}
import org.apache.spark.sql.functions._

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val full = CorpusDiff.diff(prev, next, includeUnchanged = true)
      .as[(Long, String)].collect().toMap
    assert(full == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    val delta = CorpusDiff.diff(prev, next).as[(Long, String)].collect().toMap
    assert(delta == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("diffSummary counts per class; identical snapshots are all-unchanged") {
    val prev = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val s = CorpusDiff.diffSummary(prev, prev).as[(String, Long)].collect().toMap
    assert(s == Map("unchanged" -> 2L))
  }

  test("content identity is by value, not object: re-read snapshot is unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val again = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(CorpusDiff.diff(docs, again).isEmpty)
  }

  test("filterByQuantile keeps the upper half inclusive of ties, both modes agree on rank") {
    val df = (1 to 100).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val exact = Curation.filterByQuantile(df, "v", 0.5, exact = true)
    // values 0..9 uniform; p50 of {0..9}x10 = 4.5 -> keep v >= 4.5 -> 5..9
    assert(exact.agg(min($"v")).as[Double].head() == 5.0)
    assert(exact.count() == 50)
    // GK percentile_approx returns an ELEMENT of the data (4.0), not
    // the interpolated 4.5 — with ties at the cut the kept set is one
    // value-class wider than the exact path. Both are valid thresholds.
    val approx = Curation.filterByQuantile(df, "v", 0.5)
    assert(approx.count() == 60)
    assert(approx.agg(min($"v")).as[Double].head() == 4.0)
    val lower = Curation.filterByQuantile(df, "v", 0.5, keepUpper = false, exact = true)
    assert(lower.agg(max($"v")).as[Double].head() == 4.0)
  }

  test("filterByQuantile never splits equal scores") {
    val df = Seq.fill(10)(1.0).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    assert(Curation.filterByQuantile(df, "v", 0.9, exact = true).count() == 10)
    assert(Curation.filterByQuantile(df, "v", 0.1, keepUpper = false, exact = true).count() == 10)
  }
}
