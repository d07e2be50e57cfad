package graft

import graft.ops.AnnIndex
import graft.streaming.StreamingAnnIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming vector ingestion into the persisted index: appended
  * batches become searchable, and a re-delivered batchId does not
  * duplicate rows (the commit-marker guard).
  */
class StreamingAnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range, seed: Int = 41) = {
    val rnd = new scala.util.Random(seed)
    ids.map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
  }

  test("streamed batches land in the index and are searchable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sann").toString
    val base = vecs(0 until 200).toDF("vec_id", "embedding")
    AnnIndex.build(base, dir, nClusters = 8, iters = 2)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnnIngest
      .intoIndex(source.toDF().toDF("vec_id", "embedding"), dir)
      .start()
    // Two batches: near-twins of vectors 0..2 and 3..5 under new ids.
    val twins = vecs(0 until 6).map { case (id, v) =>
      (id + 5000L, v.map(x => x + 0.001f))
    }
    source.addData(twins.take(3)); q.processAllAvailable()
    source.addData(twins.drop(3)); q.processAllAvailable()
    q.stop()

    val stored = spark.read.parquet(AnnIndex.vectorsPath(dir))
    assert(stored.count() == 206)
    val queries = vecs(0 until 6).toDF("vec_id", "embedding")
    val got = AnnIndex.topK(spark, dir, queries, k = 1, nProbe = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 6L).foreach { i =>
      assert(got(i) == i + 5000L, s"query $i must find its streamed twin")
    }
  }

  test("streamed vectors enter the PQ sidecar: topKPq sees them immediately") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sannpq").toString
    val base = vecs(0 until 200, seed = 51).toDF("vec_id", "embedding")
    AnnIndex.build(base, dir, nClusters = 8, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    // stream a near-twin of vector 3 under a fresh id
    val twin = vecs(0 until 200, seed = 51).collect { case (3L, v) =>
      (9003L, v.map(x => x + 0.001f))
    }.toDF("vec_id", "embedding")
    assert(StreamingAnnIngest.appendBatch(dir, twin, 0L))
    // the sidecar grew with the batch — vectors/ and pqcodes/ agree
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).count() == 201)
    assert(spark.read.parquet(AnnIndex.pqcodesPath(dir)).count() == 201)
    // and the PQ probe path finds the streamed vector (not only topK)
    val q = vecs(0 until 200, seed = 51).filter(_._1 == 3L).toDF("vec_id", "embedding")
    val viaPq = AnnIndex.topKPq(spark, dir, q, k = 1, nProbe = 3)
      .select($"neighbor_id").as[Long].head()
    assert(viaPq == 9003L, "topKPq must see the streamed twin immediately")
    // redelivery of the same batch stays a no-op for BOTH trees
    assert(!StreamingAnnIngest.appendBatch(dir, twin, 0L))
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).count() == 201)
    assert(spark.read.parquet(AnnIndex.pqcodesPath(dir)).count() == 201)
  }

  test("crash window with a PQ sidecar: redelivery replaces both trees") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sannpq2").toString
    val base = vecs(0 until 80, seed = 53).toDF("vec_id", "embedding")
    AnnIndex.build(base, dir, nClusters = 8, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    val batch = vecs(300 until 310, seed = 54).toDF("vec_id", "embedding")
    assert(StreamingAnnIngest.appendBatch(dir, batch, 5L))
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_stream_commits/5")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false), "test setup: marker must exist to delete")
    assert(StreamingAnnIngest.appendBatch(dir, batch, 5L))
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).count() == 90)
    assert(spark.read.parquet(AnnIndex.pqcodesPath(dir)).count() == 90)
    assert(spark.read.parquet(AnnIndex.pqcodesPath(dir)).select("vec_id").distinct().count() == 90)
  }

  test("one-file-per-cell invariant survives a session maxRecordsPerFile cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sannmrpf").toString
    AnnIndex.build(vecs(0 until 50, seed = 61).toDF("vec_id", "embedding"),
      dir, nClusters = 4, iters = 2)
    // a cluster-level file-size cap would split a hot cell's staged
    // output into several files; the staged writes pin it off
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "3")
    try {
      val batch = vecs(400 until 430, seed = 62).toDF("vec_id", "embedding")
      assert(StreamingAnnIngest.appendBatch(dir, batch, 1L))
      assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).count() == 80)
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }

  test("a re-delivered batchId is skipped, not appended twice") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sann2").toString
    val base = vecs(0 until 50, seed = 43).toDF("vec_id", "embedding")
    AnnIndex.build(base, dir, nClusters = 8, iters = 2)
    val batch = vecs(100 until 110, seed = 44).toDF("vec_id", "embedding")
    // Simulate a foreachBatch retry: the sink's own guarded append runs
    // twice with one batchId; the second delivery must no-op.
    assert(StreamingAnnIngest.appendBatch(dir, batch, 7L))
    assert(!StreamingAnnIngest.appendBatch(dir, batch, 7L))
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).count() == 60,
      "second delivery of batch 7 must not duplicate")
  }

  test("crash between install and marker: redelivery replaces, never duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sann3").toString
    val base = vecs(0 until 50, seed = 47).toDF("vec_id", "embedding")
    AnnIndex.build(base, dir, nClusters = 8, iters = 2)
    val batch = vecs(200 until 212, seed = 48).toDF("vec_id", "embedding")
    assert(StreamingAnnIngest.appendBatch(dir, batch, 9L))
    // simulate the crash window: files installed, marker never written
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_stream_commits/9")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false), "test setup: marker must exist to delete")
    // redelivery: deterministic b9-* names sweep + replace the leftovers
    assert(StreamingAnnIngest.appendBatch(dir, batch, 9L))
    val stored = spark.read.parquet(AnnIndex.vectorsPath(dir))
    assert(stored.count() == 62, "redelivery after the crash window must not duplicate")
    assert(stored.select("vec_id").distinct().count() == 62)
    // no staging leftovers
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_stream_staging")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_stream_staging")).isEmpty)
  }
}
