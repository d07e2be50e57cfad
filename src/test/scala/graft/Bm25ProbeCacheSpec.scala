package graft

import graft.ops.{Bm25, Bm25Index}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generation-stamped probe cache: a repeated same-vocabulary probe
  * must skip every dfd-side read (terms scanned = 0, stamp hit) while
  * returning identical rows; any mutation — in-JVM (eager invalidate)
  * or external (marker rewrite; listing fallback on marker-less
  * layouts) — must drop the entry so the next probe re-reads fresh
  * state. All facts read from the per-call [[Bm25Index.ProbeReport]],
  * which must also stay coherent under CONCURRENT probes (the
  * deprecated globals cannot).
  */
class Bm25ProbeCacheSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_bm25cache").toString

  private def corpus(ids: Range): DataFrame = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    ids.map { i =>
      val n = 3 + (i * 7) % 6
      (i.toLong, (0 until n).map(j => words((i * 3 + j * j) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def queries: DataFrame = Seq(
    (900L, "alpha delta absentterm"), (901L, "beta gamma"), (902L, "zeta epsilon alpha"))
    .toDF("query_id", "text")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select($"query_id", $"doc_id", $"rank", $"score_micro")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def probed(dir: String, qs: DataFrame, k: Int = 5)
      : (Set[(Long, Long, Long, Long)], Bm25Index.ProbeReport) = {
    val (df, rep) = Bm25Index.topDocsWithReport(spark, dir, qs, k)
    (rows(df), rep)
  }

  test("second same-vocabulary probe skips the dfd scan; mutations invalidate") {
    val dir = tmpDir()
    val d = corpus(0 until 50)
    Bm25Index.build(d, dir, nTb = 4)
    val (first, repCold) = probed(dir, queries)
    assert(repCold.termsScanned > 0,
      "cold cache must have scanned the query terms")
    val (second, repWarm) = probed(dir, queries)
    assert(repWarm.stampHit, "unchanged index must hit the stamp")
    assert(repWarm.termsScanned == 0,
      "warm cache must not rescan any term (absent terms cache as None too)")
    assert(second == first)

    // in-JVM mutation invalidates eagerly; the probe sees the new
    // corpus and matches the one-shot on the union
    val extra = Seq((100L, "alpha alpha zeta"), (101L, "delta newterm")).toDF("doc_id", "text")
    Bm25Index.append(spark, dir, extra)
    val (after, repAfter) = probed(dir, queries)
    assert(repAfter.termsScanned > 0,
      "append must invalidate the cached term stats (idf moved with N)")
    assert(after == rows(Bm25.topDocs(d.unionByName(extra), queries, k = 5)),
      "post-append probe must replay the one-shot on the union corpus")

    // an EXTERNAL current-version writer is caught by the generation
    // marker alone: rewriting lex/_generation (what every mutator does
    // under the writer lock) must miss the stamp with no in-JVM
    // invalidate
    probed(dir, queries) // re-warm
    val (_, repWarm2) = probed(dir, queries)
    assert(repWarm2.stampHit && repWarm2.termsScanned == 0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Bm25Index.writeGenerationMarker(fs, Bm25Index.generationMarkerPath(dir))
    val (third, repExt) = probed(dir, queries)
    assert(!repExt.stampHit,
      "an externally-rewritten generation marker must miss the stamp")
    assert(third == after, "a stamp rebuild over unchanged data changes nothing")
  }

  test("marker-less (pre-marker) layout falls back to the listing stamp") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 50), dir, nTb = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate an index written by a pre-marker binary
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(Bm25Index.generationMarkerPath(dir)), false))
    Bm25Index.invalidateProbeCache(dir)
    val (got, _) = probed(dir, queries)
    val (_, repWarm) = probed(dir, queries)
    assert(repWarm.stampHit && repWarm.termsScanned == 0,
      "the listing fallback must still stamp-hit an unchanged index")
    // an externally-touched dfd file changes the LISTING stamp
    val someDfd = fs.listStatus(new org.apache.hadoop.fs.Path(Bm25Index.dfdPath(dir)))
      .filter(_.getPath.getName.startsWith("tb="))
      .flatMap(td => fs.listStatus(td.getPath))
      .filter(_.isFile).head.getPath
    fs.setTimes(someDfd, System.currentTimeMillis() + 5000L, -1L)
    val (again, repTouch) = probed(dir, queries)
    assert(!repTouch.stampHit,
      "an externally-touched dfd file must miss the listing-fallback stamp")
    assert(again == got)
  }

  test("delete does NOT invalidate (tombstones re-read per probe) yet hides docs") {
    val dir = tmpDir()
    val d = corpus(0 until 50)
    Bm25Index.build(d, dir, nTb = 4)
    probed(dir, queries) // warm
    Bm25Index.delete(spark, dir, Seq(3L, 9L).toDF("doc_id"))
    val (got, rep) = probed(dir, queries)
    assert(rep.stampHit && rep.termsScanned == 0,
      "takedowns keep corpus stats by contract — the cache must survive them")
    assert(got.forall(r => r._2 != 3L && r._2 != 9L), "tombstoned docs leaked")
  }

  test("the term map is bounded: past the cap it flushes instead of growing") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 50), dir, nTb = 4)
    val oldCap = Bm25Index.ProbeCacheMaxTerms
    try {
      Bm25Index.ProbeCacheMaxTerms = 4
      probed(dir, queries) // alpha delta beta gamma zeta epsilon + absent = 7 > cap
      // widen the probed vocabulary across several disjoint batches —
      // the map must never exceed cap + one batch's insert round
      for (i <- 0 until 5)
        probed(dir, Seq((i.toLong, s"absent${i}a absent${i}b alpha")).toDF("query_id", "text"))
      val (terms, _) = Bm25Index.probeCacheSizes(dir).getOrElse((0, 0))
      assert(terms <= Bm25Index.ProbeCacheMaxTerms + 3,
        s"cache grew past its cap: $terms terms cached")
      // a flushed cache is a latency event, never a correctness one
      val (got, _) = probed(dir, queries)
      assert(got == rows(Bm25Index.topDocs(spark, dir, queries, k = 5, prune = false)))
    } finally Bm25Index.ProbeCacheMaxTerms = oldCap
  }

  test("concurrent probes get coherent per-call reports (no cross-talk)") {
    val dirWarm = tmpDir(); val dirCold = tmpDir()
    Bm25Index.build(corpus(0 until 50), dirWarm, nTb = 4)
    Bm25Index.build(corpus(50 until 100), dirCold, nTb = 4)
    probed(dirWarm, queries) // warm ONLY the first index
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Future.sequence((0 until 4).map { i =>
      Future {
        if (i % 2 == 0) ("warm", probed(dirWarm, queries)._2)
        else ("cold", probed(dirCold,
          Seq((i.toLong, s"zeta only$i gamma")).toDF("query_id", "text"))._2)
      }
    })
    val reports = Await.result(runs, 120.seconds)
    reports.foreach {
      case ("warm", rep) =>
        assert(rep.stampHit && rep.termsScanned == 0,
          s"warm-index report polluted by a concurrent cold probe: $rep")
      case (_, rep) =>
        assert(rep.termsScanned > 0,
          s"cold-index report polluted by a concurrent warm probe: $rep")
    }
  }
}
