package graft

import graft.ops.RetrievalEval
import org.apache.spark.sql.functions._

/** Retrieval metrics: hand-computed integer micro-point goldens
  * (disc(r) = floor(1e6/log2(r+1) + 0.5): disc(1)=1000000,
  * disc(2)=630930, disc(3)=500000), trec_eval's judged-queries-only
  * convention, and the zero-hit row shape.
  */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // q1: run (10,11,12), relevant {11, 99} -> hit at rank 2
  // q2: run (20,21,22), relevant {20, 22, 77} -> hits at ranks 1 and 3
  // q3: in the run but UNJUDGED -> must not appear
  // q4: judged {40} but absent from the run -> zero-hit row
  private def run = Seq(
    (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
    (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
    (3L, 30L, 1L)).toDF("query_id", "doc_id", "rank")

  private def qrels = Seq(
    (1L, 11L), (1L, 99L),
    (2L, 20L), (2L, 22L), (2L, 77L),
    (4L, 40L)).toDF("query_id", "doc_id")

  test("hand-computed golden: recall, rr, dcg/idcg, ndcg per query") {
    val got = RetrievalEval.evaluate(run, qrels, k = 3)
      .select($"query_id", $"n_rel", $"n_hit", $"recall", $"rr_micro",
        $"dcg_micro", $"idcg_micro", $"ndcg")
      .as[(Long, Long, Long, Double, Long, Long, Long, Double)]
      .collect().map(t => t._1 -> t).toMap
    assert(got.keySet == Set(1L, 2L, 4L), s"judged-only convention broken: ${got.keySet}")
    // q1: dcg = disc(2) = 630930; idcg = disc(1)+disc(2) = 1630930
    assert(got(1L) == ((1L, 2L, 1L, 0.5, 500000L, 630930L, 1630930L, 0.386853)), s"${got(1L)}")
    // q2: dcg = disc(1)+disc(3) = 1500000; idcg = 1000000+630930+500000
    assert(got(2L) == ((2L, 3L, 2L, 0.666667, 1000000L, 1500000L, 2130930L, 0.703918)),
      s"${got(2L)}")
    // q4: judged, never answered
    assert(got(4L) == ((4L, 1L, 0L, 0.0, 0L, 0L, 1000000L, 0.0)), s"${got(4L)}")
  }

  test("positions beyond k are ignored") {
    val deep = Seq((1L, 11L, 4L)).toDF("query_id", "doc_id", "rank")
    val got = RetrievalEval.evaluate(deep, qrels.filter($"query_id" === 1L), k = 3)
      .select($"n_hit").as[Long].head()
    assert(got == 0L, "a hit at rank 4 must not count for k=3")
  }

  test("summarize: means over judged queries") {
    val got = RetrievalEval.summarize(run, qrels, k = 3)
      .select($"n_queries", $"mean_recall", $"mrr", $"mean_ndcg")
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == 3L)
    assert(math.abs(got._2 - (0.5 + 0.666667 + 0.0) / 3) < 1e-6)
    assert(math.abs(got._3 - 0.5) < 1e-6) // (0.5 + 1.0 + 0.0) / 3
    assert(math.abs(got._4 - (0.386853 + 0.703918 + 0.0) / 3) < 1e-6)
  }

  test("duplicate qrel rows count once") {
    val doubled = qrels.union(qrels)
    val a = RetrievalEval.evaluate(run, qrels, k = 3).collect().toSet
    val b = RetrievalEval.evaluate(run, doubled, k = 3).collect().toSet
    assert(a == b)
  }

  // graded qrels: q1 {11 -> 2, 99 -> 3}, q2 {20 -> 1, 22 -> 2, 77 -> 3},
  // q4 {40 -> 2}; plus a grade-0 (judged non-relevant) row on q1's
  // rank-1 doc that must contribute to NOTHING.
  private def gradedQrels = Seq(
    (1L, 11L, 2L), (1L, 99L, 3L), (1L, 10L, 0L),
    (2L, 20L, 1L), (2L, 22L, 2L), (2L, 77L, 3L),
    (4L, 40L, 2L)).toDF("query_id", "doc_id", "grade")

  test("graded golden: gain = grade, ideal re-sorts grades, AP per query") {
    val got = RetrievalEval.evaluateGraded(run, gradedQrels, k = 3)
      .select($"query_id", $"n_rel", $"n_hit", $"recall", $"rr_micro",
        $"dcg_micro", $"idcg_micro", $"ndcg", $"ap_sum_micro", $"ap")
      .as[(Long, Long, Long, Double, Long, Long, Long, Double, Long, Double)]
      .collect().map(t => t._1 -> t).toMap
    assert(got.keySet == Set(1L, 2L, 4L), s"${got.keySet}")
    // q1: hit at rank 2 grade 2 -> dcg = 2*disc(2) = 1261860; ideal
    // [3, 2] -> idcg = 3*1000000 + 2*630930 = 4261860; AP: one hit,
    // precision 1/2 -> 500000, ap = 0.5/2 rel = 0.25. Doc 10 (grade 0)
    // is in the run at rank 1 but is NOT a hit and NOT in n_rel.
    assert(got(1L) == ((1L, 2L, 1L, 0.5, 500000L, 1261860L, 4261860L, 0.296082,
      500000L, 0.25)), s"${got(1L)}")
    // q2: hits rank 1 grade 1, rank 3 grade 2 -> dcg = 1000000 +
    // 2*500000 = 2000000; ideal [3,2,1] -> 3000000+1261860+500000;
    // AP: 1/1 then 2/3 -> 1000000 + 666667, / 3 rel.
    assert(got(2L) == ((2L, 3L, 2L, 0.666667, 1000000L, 2000000L, 4761860L, 0.420004,
      1666667L, 0.555556)), s"${got(2L)}")
    // q4: judged, never answered
    assert(got(4L) == ((4L, 1L, 0L, 0.0, 0L, 0L, 2000000L, 0.0, 0L, 0.0)), s"${got(4L)}")
  }

  test("all-grades-1 graded evaluation equals the binary path plus AP columns") {
    val ones = qrels.withColumn("grade", lit(1L))
    val graded = RetrievalEval.evaluateGraded(run, ones, k = 3)
      .drop("ap_sum_micro", "ap").collect().toSet
    val binary = RetrievalEval.evaluate(run, qrels, k = 3).collect().toSet
    assert(graded == binary, s"grade=1 must reduce to the binary metrics")
  }

  test("duplicate graded judgments collapse to the max grade") {
    val dup = gradedQrels.union(Seq((1L, 11L, 1L)).toDF("query_id", "doc_id", "grade"))
    val a = RetrievalEval.evaluateGraded(run, gradedQrels, k = 3).collect().toSet
    val b = RetrievalEval.evaluateGraded(run, dup, k = 3).collect().toSet
    assert(a == b)
  }

  test("summarizeGraded: MAP is the mean of per-query AP") {
    val got = RetrievalEval.summarizeGraded(run, gradedQrels, k = 3)
      .select($"n_queries", $"map").as[(Long, Double)].head()
    assert(got._1 == 3L)
    assert(math.abs(got._2 - (0.25 + 0.555556 + 0.0) / 3) < 1e-6, s"$got")
  }

  test("ANN recall curve: non-decreasing in probe depth, exact at full depth") {
    val dir = java.nio.file.Files.createTempDirectory("graft_recallcurve").toString
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 300).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    graft.ops.AnnIndex.build(vecs, dir, nClusters = 8, iters = 2)
    val queries = vecs.filter($"vec_id" < 10)
    val curve = RetrievalEval.annRecallCurve(spark, dir, queries, k = 5,
        nProbes = Seq(1, 2, 8))
      .orderBy($"n_probe")
      .select($"n_probe", $"n_queries", $"mean_recall")
      .as[(Int, Long, Double)].collect()
    assert(curve.map(_._1).toSeq == Seq(1, 2, 8))
    assert(curve.forall(_._2 == 10L))
    assert(curve.sliding(2).forall(w => w(0)._3 <= w(1)._3 + 1e-9),
      s"recall must be non-decreasing in nProbe: ${curve.mkString(", ")}")
    assert(curve.last._3 == 1.0, "full probe depth must recall the exact answer")
    assert(curve.head._3 < 1.0, "nProbe=1 on an 8-cell index should miss something")

    // PQ curve against the same exact ground truth: with every cell
    // probed and a corpus-sized refine budget the PQ path re-ranks all
    // candidates exactly, so the curve closes to 1.0 there too.
    graft.ops.AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    val pqCurve = RetrievalEval.annRecallCurve(spark, dir, queries, k = 5,
        nProbes = Seq(1, 8), pq = true, refine = 1000)
      .orderBy($"n_probe").select($"n_probe", $"mean_recall")
      .as[(Int, Double)].collect()
    assert(pqCurve.last._2 == 1.0,
      s"full-depth full-refine PQ probe must close to exact: ${pqCurve.mkString(", ")}")
    assert(pqCurve.head._2 <= pqCurve.last._2)
  }
}
