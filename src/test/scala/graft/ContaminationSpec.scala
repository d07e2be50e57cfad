package graft

import graft.ops.Contamination
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six"),
    (3L, "totally different words here now again"),
    (4L, "tiny doc")).toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "x y alpha beta gamma delta epsilon q")).toDF("doc_id", "text")

  test("flags exactly the docs sharing a 5-gram with the benchmark") {
    val m = Contamination.flagContamination(corpus, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_overlap_grams"),
         r.getAs[Boolean]("contaminated"))).toMap
    assert(m(1L) == ((2L, 1L, true))) // shares "alpha beta gamma delta epsilon"
    assert(m(2L) == ((2L, 0L, false)))
    assert(m(3L) == ((2L, 0L, false)))
    assert(m(4L) == ((0L, 0L, false))) // shorter than k: no grams, never flagged
  }

  test("hash semi-join fallback returns identical rows") {
    val bc = Contamination.flagContamination(corpus, bench).collect().toSet
    val hj = Contamination.flagContamination(corpus, bench, broadcastBenchmark = false)
      .collect().toSet
    assert(bc == hj)
  }

  test("contaminated spans: overlapping windows merge; scrub cuts exactly the span") {
    // doc 1 tokens: alpha(0) beta(1) gamma(2) delta(3) epsilon(4) zeta(5).
    // Windows 0..4 and 1..5? Only "alpha beta gamma delta epsilon" (start 0)
    // appears in the benchmark -> one span [0, 5).
    val spans = Contamination.contaminatedSpans(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq((1L, 0L, 5L, 1L)))
    val scrubbed = Contamination.scrubContamination(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(scrubbed(0) == ((1L, "zeta", 5L)))
    assert(scrubbed(1) == ((2L, "one two three four five six", 0L)))
    assert(scrubbed(3) == ((4L, "tiny doc", 0L))) // shorter than k: untouched
  }

  test("span scrub leaves no contaminated grams behind") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = docs.filter($"doc_id" % 17 === 0)
    val cleaned = Contamination.scrubContamination(docs, b)
      .select($"doc_id", $"clean_text".as("text"))
      .filter(length(trim($"text")) > 0)
    // Re-scan the scrubbed corpus against the same benchmark: a second
    // pass finds nothing. (In principle cutting a span stitches its
    // boundary tokens together and COULD mint a new matching gram — a
    // caller needing a guaranteed fixpoint iterates; this pins that one
    // pass suffices on the real corpus, i.e. the operator removes every
    // pre-existing match.)
    assert(Contamination.contaminatedSpans(cleaned, b).count() == 0)
  }

  test("benchmark members of a corpus are fully self-contaminated") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Contamination.flagContamination(docs, docs.filter($"doc_id" % 17 === 0))
    val members = out.filter($"doc_id" % 17 === 0 && $"n_grams" > 0)
    assert(members.count() > 0)
    assert(members.filter(!$"contaminated" || $"n_overlap_grams" =!= $"n_grams").count() == 0)
  }
}
