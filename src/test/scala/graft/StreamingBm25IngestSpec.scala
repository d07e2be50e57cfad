package graft

import graft.ops.{Bm25, Bm25Index}
import graft.streaming.StreamingBm25Ingest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming lexical ingestion: streamed batches keep the index EXACT
  * (bit-identical to a from-scratch union build), redelivered committed
  * batches are no-ops, a crash-window redelivery replaces all three
  * tables instead of duplicating, and compact refuses to run over an
  * uncommitted streamed batch.
  */
class StreamingBm25IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_sbm25").toString

  private def corpus(ids: Range): DataFrame = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    ids.map { i =>
      val n = 3 + (i * 7) % 9
      (i.toLong, (0 until n).map(j => words((i * 3 + j * j) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def queries = Seq(
    (900L, "alpha delta"), (901L, "kappa"), (902L, "theta beta iota"))
    .toDF("query_id", "text")

  private def collectTop(df: DataFrame) =
    df.select($"query_id", $"doc_id", $"rank", $"score_micro")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("streamed batches keep the index exact (== union build), across the stream API") {
    val dir = tmpDir()
    val all = corpus(0 until 60)
    // blockMax on: the sidecar-delta install discipline is part of
    // what this test asserts (flag-off streams are covered by the
    // other tests, whose builds use the default)
    Bm25Index.build(all.filter($"doc_id" < 30), dir, nTb = 8, blockMax = true)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingBm25Ingest
      .intoIndex(source.toDF().toDF("doc_id", "text"), dir)
      .start()
    val tail = corpus(30 until 60).as[(Long, String)].collect().toSeq
    source.addData(tail.take(15)); q.processAllAvailable()
    source.addData(tail.drop(15)); q.processAllAvailable()
    q.stop()

    val got = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(got == collectTop(Bm25.topDocs(all, queries, k = 5)),
      "streamed index must answer bit-identically to a union build")
    // the Block-Max sidecar rode both batches under the same
    // deterministic-name install discipline as dfd/postings
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bmRoot = new org.apache.hadoop.fs.Path(Bm25Index.blockmaxPath(dir))
    val staged = fs.listStatus(bmRoot)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("tb="))
      .flatMap(td => fs.listStatus(td.getPath))
      .map(_.getPath.getName)
    assert(staged.exists(_ == "b0.parquet") && staged.exists(_ == "b1.parquet"),
      s"streamed blockmax deltas missing: ${staged.mkString(",")}")
  }

  test("redelivered committed batch is a counted no-op for all three tables") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 20), dir, nTb = 4)
    val batch = corpus(100 until 110)
    assert(StreamingBm25Ingest.appendBatch(dir, batch, 7L))
    val docs = Bm25Index.stats(spark, dir).docs
    val statDeltas = Bm25Index.stats(spark, dir).statDeltas
    assert(!StreamingBm25Ingest.appendBatch(dir, batch, 7L))
    val after = Bm25Index.stats(spark, dir)
    assert(after.docs == docs && after.statDeltas == statDeltas,
      s"redelivery must not re-append: $after")
  }

  test("crash window: partial install is replaced, not duplicated, on redelivery") {
    val dir = tmpDir()
    val all = corpus(0 until 40)
    Bm25Index.build(all.filter($"doc_id" < 30), dir, nTb = 4)
    val batch = all.filter($"doc_id" >= 30)
    assert(StreamingBm25Ingest.appendBatch(dir, batch, 3L))
    // Simulate the crash-before-marker window: drop the marker. The
    // installed b3.parquet files are the partial attempt's leftovers.
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_stream_commits/3")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false), "test setup: marker must exist")
    assert(StreamingBm25Ingest.appendBatch(dir, batch, 3L),
      "redelivery of an unsealed batch must re-run")
    val got = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(got == collectTop(Bm25.topDocs(all, queries, k = 5)),
      "crash-window redelivery must replace, never double-count")
    assert(Bm25Index.stats(spark, dir).docs == 40L)
    // The vocabulary delta survives the redelivery too: the recount
    // masks the partial attempt's own installed dfd file (else it
    // would see its own terms and replace the delta with 0).
    val vocab = all
      .select(org.apache.spark.sql.functions.explode(
        graft.ops.TextAnalysis.tokens($"text")).as("t"))
      .distinct().count()
    assert(Bm25Index.stats(spark, dir).terms == vocab,
      "redelivery must recompute the same vocabulary-novelty delta")
  }

  test("compact refuses over an uncommitted streamed batch, runs after it commits") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 20), dir, nTb = 4)
    StreamingBm25Ingest.appendBatch(dir, corpus(50 until 60), 11L)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_stream_commits/11")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false))
    val e = intercept[IllegalStateException] { Bm25Index.compact(spark, dir) }
    assert(e.getMessage.contains("uncommitted streamed batch"))
    // redeliver (re-seals the marker) -> compact proceeds and the
    // result equals a fresh union build
    StreamingBm25Ingest.appendBatch(dir, corpus(50 until 60), 11L)
    Bm25Index.compact(spark, dir)
    val union = corpus(0 until 20).union(corpus(50 until 60))
    assert(collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5)) ==
      collectTop(Bm25.topDocs(union, queries, k = 5)))
  }

  test("rebuild clears stream markers (fresh streams restart at batch 0)") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 20), dir, nTb = 4)
    StreamingBm25Ingest.appendBatch(dir, corpus(50 until 55), 0L)
    Bm25Index.build(corpus(0 until 20), dir, nTb = 4)
    // a NEW stream's batch 0 must not be skipped by the old marker
    assert(StreamingBm25Ingest.appendBatch(dir, corpus(60 until 65), 0L),
      "stale marker from the previous generation skipped a fresh batch")
    assert(Bm25Index.stats(spark, dir).docs == 25L)
  }
}
