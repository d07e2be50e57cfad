package graft

import graft.ops.{Bm25, Bm25Index}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generation-stamped probe cache: a repeated same-vocabulary probe
  * must skip every dfd-side read (terms scanned = 0, stamp hit) while
  * returning identical rows; any mutation — in-JVM (eager invalidate)
  * or external (stamp mismatch from the file listing) — must drop the
  * entry so the next probe re-reads fresh state.
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

  test("second same-vocabulary probe skips the dfd scan; mutations invalidate") {
    val dir = tmpDir()
    val d = corpus(0 until 50)
    Bm25Index.build(d, dir, nTb = 4)
    val first = rows(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(Bm25Index.lastProbeTermsScanned > 0,
      "cold cache must have scanned the query terms")
    val second = rows(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(Bm25Index.lastProbeStampHit, "unchanged index must hit the stamp")
    assert(Bm25Index.lastProbeTermsScanned == 0,
      "warm cache must not rescan any term (absent terms cache as None too)")
    assert(second == first)

    // in-JVM mutation invalidates eagerly; the probe sees the new
    // corpus and matches the one-shot on the union
    val extra = Seq((100L, "alpha alpha zeta"), (101L, "delta newterm")).toDF("doc_id", "text")
    Bm25Index.append(spark, dir, extra)
    val after = rows(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(Bm25Index.lastProbeTermsScanned > 0,
      "append must invalidate the cached term stats (idf moved with N)")
    assert(after == rows(Bm25.topDocs(d.unionByName(extra), queries, k = 5)),
      "post-append probe must replay the one-shot on the union corpus")

    // an EXTERNAL writer is caught by the stamp alone: touching a dfd
    // file's mtime changes the listing hash, so the entry rebuilds
    // even though no in-JVM invalidate ran
    rows(Bm25Index.topDocs(spark, dir, queries, k = 5)) // re-warm
    assert(Bm25Index.lastProbeStampHit && Bm25Index.lastProbeTermsScanned == 0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val someDfd = fs.listStatus(new org.apache.hadoop.fs.Path(Bm25Index.dfdPath(dir)))
      .filter(_.getPath.getName.startsWith("tb="))
      .flatMap(td => fs.listStatus(td.getPath))
      .filter(_.isFile).head.getPath
    fs.setTimes(someDfd, System.currentTimeMillis() + 5000L, -1L)
    val third = rows(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(!Bm25Index.lastProbeStampHit,
      "an externally-touched dfd file must miss the stamp")
    assert(third == after, "a stamp rebuild over unchanged data changes nothing")
  }

  test("delete does NOT invalidate (tombstones re-read per probe) yet hides docs") {
    val dir = tmpDir()
    val d = corpus(0 until 50)
    Bm25Index.build(d, dir, nTb = 4)
    rows(Bm25Index.topDocs(spark, dir, queries, k = 5)) // warm
    Bm25Index.delete(spark, dir, Seq(3L, 9L).toDF("doc_id"))
    val got = rows(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(Bm25Index.lastProbeStampHit && Bm25Index.lastProbeTermsScanned == 0,
      "takedowns keep corpus stats by contract — the cache must survive them")
    assert(got.forall(r => r._2 != 3L && r._2 != 9L), "tombstoned docs leaked")
  }
}
