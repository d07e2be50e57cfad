package graft

import graft.ops.Curation
import graft.streaming.StreamingCuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // Permissive row filters: these tests exercise the dedup state
  // machinery, not the language/quality heuristics.
  private val cfg = Curation.Config(
    langs = Set("en", "de", "fr", "es", "zh", "und"),
    minQuality = 0.0,
    maxDupTrigramFrac = 1.0,
    nearDupThreshold = 0.9)

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text").withColumn("source", lit("src0"))

  // 30 distinct common words: 28 3-shingles. Appending 3 words makes a
  // 31-shingle doc with J = 28/31 ~ 0.903 vs the base — just over the
  // 0.9 threshold; two different 3-word suffixes give J = 28/34 ~ 0.82
  // to each other — under it.
  private val base = ("the quick brown fox jumps over a lazy dog while many people " +
    "watch the bright morning sun rise slowly above tall green hills and " +
    "cold rivers flow gently down toward").trim
  require(base.split(" ").length == 30)

  test("survivor sets match the batch pipeline on batch-split real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"source")
    val bench = docs.filter($"doc_id" % 17 === 0)
    val parityCfg = Curation.Config(
      langs = Set("en", "de", "fr", "es", "zh", "und"),
      minQuality = 0.3,
      maxDupTrigramFrac = 0.9,
      nearDupThreshold = 0.9,
      mixtureRates = Map("src0" -> 1.0),
      defaultRate = 0.5)

    val batchIds = Curation.curate(docs, parityCfg, Some(bench))
      .packed.select("doc_id").as[Long].collect().toSet

    val sc = new StreamingCuration(spark, tmp("graft_scur_parity"), parityCfg, Some(bench))
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut1 = ids(ids.length / 3)
    val cut2 = ids(2 * ids.length / 3)
    val streamIds = Seq(
      docs.filter($"doc_id" <= cut1),
      docs.filter($"doc_id" > cut1 && $"doc_id" <= cut2),
      docs.filter($"doc_id" > cut2))
      .zipWithIndex
      .flatMap { case (b, i) =>
        sc.curateBatch(b, i.toLong).select("doc_id").as[Long].collect()
      }.toSet

    assert(streamIds == batchIds,
      s"streaming-only=${(streamIds -- batchIds).toSeq.sorted.take(10)} " +
        s"batch-only=${(batchIds -- streamIds).toSeq.sorted.take(10)}")
  }

  test("line-dedup stage: survivors AND cleaned text match the batch pipeline") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id",
        concat_ws("\n",
          when($"doc_id" % 3 === 0, lit("subscribe to our newsletter")),
          $"text", lit("all rights reserved")).as("text"),
        $"source")
    val cfgLine = Curation.Config(
      langs = Set("en", "de", "fr", "es", "zh", "und"),
      minQuality = 0.0,
      mixtureRates = Map("src0" -> 1.0), defaultRate = 1.0,
      lineDedupMinCount = Some(2))

    val batchOut = Curation.curate(docs, cfgLine)
      .packed.select("doc_id").as[Long].collect().toSet

    val sc = new StreamingCuration(spark, tmp("graft_scur_line"), cfgLine)
    val streamed = Seq(
      docs.filter($"doc_id" < 150),
      docs.filter($"doc_id" >= 150 && $"doc_id" < 350),
      docs.filter($"doc_id" >= 350))
      .zipWithIndex
      .flatMap { case (b, i) =>
        sc.curateBatch(b, i.toLong)
          .select($"doc_id", $"text").as[(Long, String)].collect()
      }
    assert(streamed.map(_._1).toSet == batchOut)
    // cleaned text: exactly one footer copy survives across all batches
    assert(streamed.count(_._2.contains("all rights reserved")) == 1)
    // and the surviving texts equal the standalone batch operator's
    val expectedText = graft.ops.LineDedup.removeDuplicatedLines(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(streamed.forall { case (id, t) => expectedText(id) == t })
  }

  test("HTML-extraction stage applies per micro-batch identically to batch (shared rowStages)") {
    val shell = (id: Long, body: String) =>
      s"<html><!-- $id --><script>track($id)</script><body><p>$body</p>" +
        "<div class=\"nav\"><ul><li>Home</li></ul></div></body></html>"
    val docs = corpus(
      1L -> shell(1, "the quick brown fox jumps over the lazy dog again today"),
      2L -> shell(2, "a completely different sentence with many common simple words here"),
      3L -> shell(3, "third document text that should also survive the row filters fine"))
    val htmlCfg = cfg.copy(htmlExtractMinWords = Some(3))

    val batch = Curation.rowStages(docs, htmlCfg)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(batch.nonEmpty && batch.values.forall(t => !t.contains("<") && !t.contains("track")))
    assert(!batch.values.exists(_.contains("Home")), "1-word nav line must be dropped at minWords=3")

    val sc = new StreamingCuration(spark, tmp("graft_scur_html"), htmlCfg, None)
    val streamed = Seq(docs.filter($"doc_id" <= 2), docs.filter($"doc_id" > 2))
      .zipWithIndex
      .flatMap { case (b, i) =>
        sc.curateBatch(b, i.toLong).select("doc_id", "text").as[(Long, String)].collect()
      }.toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (id, t) => assert(t == batch(id), s"doc $id text diverged") }
  }

  test("exact duplicates are dropped across batches; first arrival survives") {
    val sc = new StreamingCuration(spark, tmp("graft_scur_exact"), cfg)
    val b0 = sc.curateBatch(corpus(1L -> base, 2L -> s"$base entirely different tail here"), 0L)
    assert(b0.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // same normalized text (case + whitespace differences) in batch 1
    val b1 = sc.curateBatch(corpus(10L -> s"  ${base.toUpperCase}  ", 11L -> "a fresh unrelated text about winter storms"), 1L)
    assert(b1.select("doc_id").as[Long].collect().toSet == Set(11L),
      "a historical normalized duplicate must be dropped")
  }

  test("near-duplicates are dropped across batches, including transitively within a batch") {
    val sc = new StreamingCuration(spark, tmp("graft_scur_near"), cfg)
    // batch 0: A = base + suffix p
    val a = s"$base alpha beta gamma"
    val b = base
    val c = s"$base delta epsilon zeta"
    assert(graft.ops.Dedup.jaccard(
      graft.ops.Dedup.shingleSet(a), graft.ops.Dedup.shingleSet(b)) >= 0.9)
    assert(graft.ops.Dedup.jaccard(
      graft.ops.Dedup.shingleSet(b), graft.ops.Dedup.shingleSet(c)) >= 0.9)
    assert(graft.ops.Dedup.jaccard(
      graft.ops.Dedup.shingleSet(a), graft.ops.Dedup.shingleSet(c)) < 0.9)
    val b0 = sc.curateBatch(corpus(1L -> a), 0L)
    assert(b0.select("doc_id").as[Long].collect().toSet == Set(1L))
    // batch 1: B ~ A (history edge), C ~ B only (in-batch edge) — the
    // component {B, C} touches history through B, so BOTH drop even
    // though C has no direct edge to any historical doc.
    val b1 = sc.curateBatch(corpus(10L -> b, 11L -> c,
      12L -> "completely unrelated prose about summer sailing trips"), 1L)
    assert(b1.select("doc_id").as[Long].collect().toSet == Set(12L),
      "history-connected component must drop transitively")
  }

  test("batch re-delivery is idempotent: same survivors, state not double-applied") {
    val sc = new StreamingCuration(spark, tmp("graft_scur_retry"), cfg)
    sc.curateBatch(corpus(1L -> base), 0L)
    val texts1 = corpus(10L -> s"$base alpha beta gamma", 11L -> "novel text about deep ocean currents")
    val first = sc.curateBatch(texts1, 1L).select("doc_id").as[Long].collect().toSet
    val retry = sc.curateBatch(texts1, 1L).select("doc_id").as[Long].collect().toSet
    assert(first == retry, "retried batch must reproduce its survivors")
    // a later batch duplicating the retried batch's survivor is still
    // dropped exactly once (state holds one copy, not two)
    val b2 = sc.curateBatch(corpus(20L -> "novel text about deep ocean currents"), 2L)
    assert(b2.count() == 0L)
  }

  test("foreachBatch sink lands per-batch survivor parquet") {
    val out = tmp("graft_scur_out")
    val sc = new StreamingCuration(spark, tmp("graft_scur_sink"), cfg)
    val sink = sc.sink(out)
    sink(corpus(1L -> base), 0L)
    sink(corpus(2L -> base, 3L -> "another idea entirely about mountain weather"), 1L)
    val got = spark.read.parquet(s"$out/batch=1").select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
    assert(spark.read.parquet(s"$out/batch=0").count() == 1L)
  }
}
