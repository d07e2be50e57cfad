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

    val stored = spark.read.parquet(s"$dir/vectors")
    assert(stored.count() == 206)
    val queries = vecs(0 until 6).toDF("vec_id", "embedding")
    val got = AnnIndex.topK(spark, dir, queries, k = 1, nProbe = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 6L).foreach { i =>
      assert(got(i) == i + 5000L, s"query $i must find its streamed twin")
    }
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
    assert(spark.read.parquet(s"$dir/vectors").count() == 60,
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
    val stored = spark.read.parquet(s"$dir/vectors")
    assert(stored.count() == 62, "redelivery after the crash window must not duplicate")
    assert(stored.select("vec_id").distinct().count() == 62)
    // no staging leftovers
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_stream_staging")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_stream_staging")).isEmpty)
  }
}
