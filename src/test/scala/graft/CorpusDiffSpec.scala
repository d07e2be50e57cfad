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

  test("null / non-integral ids fail loudly instead of misclassifying") {
    val good = Seq(("1", "a"), ("2", "b")).toDF("doc_id", "text")
    val nulls = Seq((Some("1"), "a"), (None, "b")).toDF("doc_id", "text")
    val strs = Seq(("1", "a"), ("not-a-number", "b")).toDF("doc_id", "text")
    // Integral strings are fine — and both present docs match, never
    // added+removed (the silent-cast corruption the guard exists for).
    assert(CorpusDiff.diff(good, good).isEmpty)
    intercept[Exception] { CorpusDiff.diff(nulls, good).collect() }
    intercept[Exception] { CorpusDiff.diff(good, strs).collect() }
  }

  test("incrementalTargets works when the id column is literally 'id'") {
    val prev = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val next = Seq((1L, "a"), (2L, "b2"), (3L, "c")).toDF("id", "text")
    val (reprocess, tomb) = CorpusDiff.incrementalTargets(prev, next, idCol = "id")
    // The caller's id column must survive the join (no ambiguity, no drop).
    assert(reprocess.columns.toSeq == Seq("id", "text"))
    assert(reprocess.select($"id").as[Long].collect().toSet == Set(2L, 3L))
    assert(tomb.isEmpty)
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

  test("incremental reprocess == full recompute through stateless row stages") {
    val prev = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"source")
    val next = prev.filter($"doc_id" % 13 =!= 0)
      .select($"doc_id", when($"doc_id" % 7 === 0, concat($"text", lit(" extra words here")))
        .otherwise($"text").as("text"), $"source")
      .union(prev.filter($"doc_id" % 19 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text", $"source"))
    val cfg = graft.ops.Curation.Config(
      langs = Set("en", "de", "fr", "es", "zh", "und"), minQuality = 0.3)

    val full = graft.ops.Curation.rowStages(next, cfg)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap

    val (reprocess, tombstones) = CorpusDiff.incrementalTargets(prev, next)
    val dead = tombstones.as[Long].collect().toSet
    val redone = graft.ops.Curation.rowStages(reprocess, cfg)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // carried over: the PREVIOUS run's results for unchanged survivors
    val prevRun = graft.ops.Curation.rowStages(prev, cfg)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val changedOrNew = redone.keySet ++
      CorpusDiff.diff(prev, next).where($"change" === "changed")
        .select($"id").as[Long].collect().toSet
    val carried = prevRun.filter { case (id, _) =>
      !dead(id) && !changedOrNew(id) }
    assert(carried ++ redone == full,
      "delta reprocess + carry-over must equal the full recompute")
    assert(redone.size < full.size, "the delta is genuinely smaller")
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
