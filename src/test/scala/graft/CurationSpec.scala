package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private val cfg = Curation.Config(
    langs = Set("en", "de", "fr", "es", "zh", "und"),
    minQuality = 0.3,
    maxDupTrigramFrac = 0.9,
    nearDupThreshold = 0.9,
    mixtureRates = Map("src0" -> 1.0),
    defaultRate = 0.5,
    packBudget = 256L,
    packShards = 4)

  test("full pipeline: stages shrink monotonically, packs respect the budget") {
    val bench = docs.filter($"doc_id" % 17 === 0)
    val res = Curation.curate(docs, cfg, Some(bench))
    val counts = res.report.map(_._2)
    assert(res.report.map(_._1) == Seq(
      "input", "row_filters", "exact_dedup", "near_dedup", "decontaminated",
      "mixture", "packed"))
    // every filter stage can only shrink; packing preserves rows
    assert(counts.init.zip(counts.init.tail).forall { case (a, b) => b <= a },
      s"non-monotone report: ${res.report}")
    assert(counts.last == counts(counts.length - 2))
    assert(counts.head == docs.count())
    assert(counts(4) < counts(3), "benchmark members must be dropped by decontamination")
    assert(res.packed.filter($"pack_offset" < 0 || $"pack_offset" >= 256).count() == 0)
  }

  test("perplexity band stage: drops planted gibberish, survivors match the operator") {
    val gib = (9000001L to 9000010L)
      .map(i => (i, (0 until 30).map(j => s"zqx${i}_$j").mkString(" "), "src0"))
      .toDF("doc_id", "text", "source")
    val all = docs.select($"doc_id", $"text", $"source").unionByName(gib)
    // Band: up to the natural corpus's worst cross-entropy. All-OOV
    // gibberish sits strictly above it under the corpus LM.
    val natural = Curation.rowStages(all, cfg).filter($"doc_id" < 9000000L)
    val hi = graft.ops.LanguageModel.perplexityScores(natural, minCount = 2)
      .agg(max($"cross_entropy")).as[Double].head() + 1e-9
    val res = Curation.curate(all, cfg.copy(perplexityBand = Some((0.0, hi))))
    val names = res.report.map(_._1)
    assert(names.contains("perplexity_band"))
    val byName = res.report.toMap
    assert(byName("perplexity_band") <= byName("row_filters"))
    assert(res.packed.filter($"doc_id" >= 9000000L).count() == 0,
      "gibberish must not survive the band")
  }

  test("substring stage: same survivors, duplicated spans keep one copy") {
    val withSub = cfg.copy(substringMinTokens = Some(8))
    val res = Curation.curate(docs, withSub)
    assert(res.report.map(_._1).contains("substring_dedup"))
    // A transform, not a filter: survivor count matches near_dedup.
    val byName = res.report.toMap
    assert(byName("substring_dedup") == byName("near_dedup"))
    // Packed output carries token counts, not text: the packed
    // n_tokens must equal the standalone operator's clean-text token
    // count over the same survivor set (mixture hashes only doc_id, so
    // the survivor ids are identical with and without the stage).
    val plain = Curation.curate(docs, cfg)
    val survivors = docs.join(plain.packed.select($"doc_id"), "doc_id")
    val expected = graft.ops.SubstringDedup
      .removeDuplicatedSpans(survivors, minTokens = 8)
      .select($"doc_id",
        graft.ops.TextAnalysis.tokenCount($"clean_text").cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = res.packed.select($"doc_id", $"n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    // and the stage did real work: some survivor's token count shrank
    val plainCounts = plain.packed.select($"doc_id", $"n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.exists { case (id, n) => n < plainCounts(id) })
  }

  test("line-dedup stage: boilerplate keeps one copy before doc-level dedup") {
    val boiler = docs.select($"doc_id",
      concat($"text", lit("\nall rights reserved")).as("text"), $"source")
    val res = Curation.curate(boiler, cfg.copy(lineDedupMinCount = Some(2)))
    val byName = res.report.toMap
    assert(byName("line_dedup") == byName("input"), "a transform, not a filter")
    // exactly one surviving copy of the injected footer corpus-wide:
    // recompute the standalone operator on the same input
    val cleaned = graft.ops.LineDedup.removeDuplicatedLines(boiler)
    assert(cleaned.filter($"clean_text".contains("all rights reserved")).count() == 1)
  }

  test("quality-quantile stage: drops the lower tail, survivors match the operator") {
    val res = Curation.curate(docs, cfg.copy(minQuality = 0.0, qualityQuantile = Some(0.25)))
    val plain = Curation.curate(docs, cfg.copy(minQuality = 0.0))
    val byName = res.report.toMap
    val plainByName = plain.report.toMap
    assert(byName("row_filters") < plainByName("row_filters"),
      "the quantile cutoff must drop documents the absolute cutoff kept")
    // survivors = the operator's own answer over the row-stage output
    val scrubbed = Curation.rowStages(
      docs.select($"doc_id", $"text", $"source"), cfg.copy(minQuality = 0.0))
    val q = graft.ops.TextAnalysis.qualityScore(scrubbed).select($"doc_id", $"quality")
    val expect = Curation.filterByQuantile(q, "quality", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val got = res.packed.select("doc_id").as[Long].collect().toSet
    assert(got.subsetOf(expect), "every packed survivor passed the quantile cut")
  }

  test("pipeline is deterministic across input partitionings") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.curate(d, cfg).packed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(run(docs) == run(docs.repartition(11)))
  }
}
