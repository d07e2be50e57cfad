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

  test("pipeline is deterministic across input partitionings") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.curate(d, cfg).packed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(run(docs) == run(docs.repartition(11)))
  }
}
