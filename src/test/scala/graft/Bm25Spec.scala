package graft

import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** BM25 + RRF: hand-computed integer micro-point goldens (the formula
  * at k1=1.5, b=0.75 with the per-term micro-nat idf snap), layout
  * determinism, and the fusion contract.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // N=3, avgdl=3.0; df: apple=2 banana=2 cherry=2 date=1
  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana cherry date")).toDF("doc_id", "text")

  private def query = Seq((100L, "apple date")).toDF("query_id", "text")

  test("hand-computed golden: scores, ranks, candidate set") {
    // idf_micro(apple) = floor(ln(1 + 1.5/2.5)*1e6 + 0.5) = 470004
    // idf_micro(date)  = floor(ln(1 + 2.5/1.5)*1e6 + 0.5) = 980829
    // d1: apple tf=2 dl=3 -> 671434; d2: apple tf=1 dl=2 -> 552946
    // d3: date  tf=1 dl=4 -> 852895
    val got = Bm25.topDocs(corpus, query, k = 10)
      .select($"query_id", $"doc_id", $"rank", $"score_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (100L, 3L, 1L, 852895L),
      (100L, 1L, 2L, 671434L),
      (100L, 2L, 3L, 552946L)), s"golden mismatch: $got")
  }

  test("zero-overlap docs never appear; duplicate query terms count once") {
    val q2 = Seq((7L, "date date date")).toDF("query_id", "text")
    val got = Bm25.scores(corpus, q2)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toMap
    // only d3 contains "date"; tripling the term must not triple the score
    assert(got.keySet == Set(3L))
    assert(got(3L) == 852895L, s"distinct-term dedup broken: $got")
  }

  test("scores are layout-independent (repartition determinism)") {
    val base = Bm25.topDocs(corpus, query, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    val shuffled = Bm25.topDocs(corpus.repartition(7), query.repartition(3), k = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(base == shuffled)
  }

  test("rrf: integer micro contributions, membership count, fusion ranks") {
    // floor(1e6/61 + 0.5) = 16393, floor(1e6/62 + 0.5) = 16129
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "doc_id", "rank")
    val fused = Bm25.fuseTopK(Seq(a, b), k = 3)
      .select($"query_id", $"doc_id", $"rank", $"n_lists", $"rrf_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fused == Set(
      (1L, 11L, 1L, 2L, 32522L), // both lists: 16129 + 16393
      (1L, 10L, 2L, 1L, 16393L),
      (1L, 12L, 3L, 1L, 16129L)), s"fusion mismatch: $fused")
  }

  test("rrf ties break by doc_id; k truncates after fusion") {
    // two docs with identical single-list rank 1 -> equal scores
    val a = Seq((1L, 20L, 1L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 19L, 1L)).toDF("query_id", "doc_id", "rank")
    val fused = Bm25.fuseTopK(Seq(a, b), k = 1)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toSeq
    assert(fused == Seq((19L, 1L)), s"tie-break mismatch: $fused")
  }

  test("bm25 candidate generation stays join-shaped (no window over the corpus)") {
    val plan = Bm25.scores(corpus, query).queryExecution.executedPlan
    val hasWindow = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.nonEmpty
    assert(!hasWindow, "BM25 scoring must not window over the corpus")
  }
}
