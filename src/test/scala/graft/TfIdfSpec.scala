package graft

import graft.ops.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry")).toDF("doc_id", "text")

  test("hand-computed tf/df weights and ranks") {
    val out = TfIdf.topTerms(docs, k = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("score"), r.getAs[Int]("rank")))
      .toMap
    assert(out((1L, "apple")) == ((2L, 1L, 2.0, 1)))   // tf 2, df 1 -> 2.0, most distinctive
    assert(out((1L, "banana")) == ((1L, 2L, 0.5, 2)))
    assert(out((2L, "cherry")) == ((1L, 1L, 1.0, 1)))
    assert(out((2L, "banana")) == ((1L, 2L, 0.5, 2)))
  }

  test("hash-join vocabulary fallback is identical") {
    val bc = TfIdf.topTerms(docs, k = 2).collect().toSet
    val hj = TfIdf.topTerms(docs, k = 2, broadcastVocab = false).collect().toSet
    assert(bc == hj)
  }

  test("every document gets exactly min(k, distinct terms) ranked rows") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TfIdf.topTerms(real, k = 3)
    val counts = out.groupBy($"doc_id").count()
    assert(counts.filter($"count" > 3).count() == 0)
    assert(counts.count() == real.count())
  }
}
