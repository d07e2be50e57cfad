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

  test("benchmark members of a corpus are fully self-contaminated") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Contamination.flagContamination(docs, docs.filter($"doc_id" % 17 === 0))
    val members = out.filter($"doc_id" % 17 === 0 && $"n_grams" > 0)
    assert(members.count() > 0)
    assert(members.filter(!$"contaminated" || $"n_overlap_grams" =!= $"n_grams").count() == 0)
  }
}
