package graft

import graft.ops.DataCard
import org.apache.spark.sql.functions._

class DataCardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hand corpus: counts, quantiles, dup mass, n=1 slice edge") {
    val d = Seq(
      (1L, "one two three", "a", "en"),        // 3 toks
      (2L, "one two three four five", "a", "en"), // 5 toks
      (3L, "one", "a", "en"),                  // 1 tok
      (4L, "one two three", "b", "en"),        // dup of doc 1 (cross-slice)
      (5L, "solo doc here", "c", "de")         // n=1 slice
    ).toDF("doc_id", "text", "source", "lang")
    val card = DataCard.card(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap

    val aEn = card(("a", "en"))
    assert(aEn.getAs[Long]("n_docs") == 3L)
    assert(aEn.getAs[Long]("n_tokens") == 9L)
    // p50 of [1,3,5] = 2nd smallest = 3; p90 = ceil(2.7)=3rd = 5.
    assert(aEn.getAs[Long]("p50_tokens") == 3L)
    assert(aEn.getAs[Long]("p90_tokens") == 5L)
    // docs 1 and 4 share normalized text -> dup mass lands in BOTH slices.
    assert(aEn.getAs[Long]("n_dup_docs") == 1L)
    assert(card(("b", "en")).getAs[Long]("n_dup_docs") == 1L)

    val cDe = card(("c", "de"))
    assert(cDe.getAs[Long]("n_docs") == 1L)
    assert(cDe.getAs[Long]("p50_tokens") == 3L && cDe.getAs[Long]("p90_tokens") == 3L)
  }

  test("real corpus: shares sum to ~1, totals match the corpus") {
    val card = DataCard.card(docs)
    val tot = card.agg(
      sum($"n_docs"), sum($"n_tokens"), sum($"doc_share"), sum($"token_share"))
      .head()
    assert(tot.getLong(0) == docs.count())
    assert(math.abs(tot.getDouble(2) - 1.0) < 1e-3)
    assert(math.abs(tot.getDouble(3) - 1.0) < 1e-3)
    // every slice's p50 <= p90
    assert(card.filter($"p50_tokens" > $"p90_tokens").count() == 0)
  }

  test("deterministic under repartition") {
    def run(d: org.apache.spark.sql.DataFrame) =
      DataCard.card(d).collect().map(r => r.toSeq).toSet
    assert(run(docs) == run(docs.repartition(13)))
  }
}
