package graft

import graft.ops.DedupIndex
import graft.streaming.StreamingDedupIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingest through the persisted dedup index: survivors per
  * batch, cross-batch filtering, and convergence from every crash
  * point of the two-marker commit (the survivors-first discipline —
  * a redelivered batch recomputes an EMPTY survivor set once its
  * hashes are in the index, so ordering is what keeps the first
  * attempt's survivors alive).
  */
class StreamingDedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String, String) = {
    n += 1
    val dir = java.nio.file.Files.createTempDirectory("graft_sdidx").toString
    (dir, s"graft_test_sdedup_idx_$n", s"$dir/survivors")
  }

  private def survivorIds(out: String): Set[Long] =
    spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet

  test("streamed batches: survivors per batch, duplicates filtered across batches") {
    val (dir, tbl, out) = fresh()
    DedupIndex.build(Seq(1L -> "seed page").toDF("doc_id", "text"), dir, tbl, nBuckets = 4)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingDedupIndex
      .intoIndex(source.toDF().toDF("doc_id", "text"), tbl, out)
      .start()
    source.addData(Seq(10L -> "page A", 11L -> "seed page", 12L -> "page  a"))
    q.processAllAvailable()
    source.addData(Seq(20L -> "PAGE A", 21L -> "page B"))
    q.processAllAvailable()
    q.stop()
    assert(survivorIds(s"$out/batch=0") == Set(10L), "batch 0: A survives once, seed filtered")
    assert(survivorIds(s"$out/batch=1") == Set(21L), "batch 1: A already ingested, only B")
    assert(spark.table(tbl).count() == 3) // seed, A, B
  }

  test("full redelivery of a committed batch is a no-op") {
    val (dir, tbl, out) = fresh()
    DedupIndex.build(Seq(1L -> "seed").toDF("doc_id", "text"), dir, tbl, nBuckets = 4)
    val batch = Seq(30L -> "thing one", 31L -> "thing two").toDF("doc_id", "text")
    assert(StreamingDedupIndex.ingestBatch(spark, tbl, out, batch, 5L))
    assert(!StreamingDedupIndex.ingestBatch(spark, tbl, out, batch, 5L))
    assert(survivorIds(s"$out/batch=5") == Set(30L, 31L))
    assert(spark.table(tbl).count() == 3)
  }

  test("crash between survivor write and hash append: retry preserves survivors, appends hashes") {
    val (dir, tbl, out) = fresh()
    DedupIndex.build(Seq(1L -> "seed").toDF("doc_id", "text"), dir, tbl, nBuckets = 4)
    val batch = Seq(40L -> "crash page").toDF("doc_id", "text")
    // Construct the crash state directly: survivors written and
    // marked, hash append never committed (index unchanged, no final
    // marker) — a parquet table admits no row DELETE to rewind with.
    DedupIndex.filterNew(spark, tbl, batch).drop("text_hash", "n_dups")
      .write.mode("overwrite").parquet(s"$out/batch=8")
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(out, "_survivors_done"))
    fs.create(new Path(out, "_survivors_done/8"), false).close()
    assert(spark.table(tbl).count() == 1, "crash state: hashes not yet appended")
    assert(StreamingDedupIndex.ingestBatch(spark, tbl, out, batch, 8L))
    assert(survivorIds(s"$out/batch=8") == Set(40L), "survivors intact after retry")
    assert(spark.table(tbl).count() == 2, "hashes appended exactly once")
  }

  test("crash after hash append but before its marker: retry never erases survivors") {
    val (dir, tbl, out) = fresh()
    DedupIndex.build(Seq(1L -> "seed").toDF("doc_id", "text"), dir, tbl, nBuckets = 4)
    val batch = Seq(50L -> "window page").toDF("doc_id", "text")
    assert(StreamingDedupIndex.ingestBatch(spark, tbl, out, batch, 9L))
    // only the final marker is lost; the index already has the hashes,
    // so the retry's recomputed survivor set is EMPTY — the marker on
    // the survivor step is what must protect the written survivors
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(out, "_hashes_done/9"), false))
    assert(StreamingDedupIndex.ingestBatch(spark, tbl, out, batch, 9L))
    assert(survivorIds(s"$out/batch=9") == Set(50L),
      "retry with hashes already indexed must not overwrite survivors with empty")
    assert(spark.table(tbl).filter($"keep_id" === 50L).count() == 1,
      "the empty re-append must not duplicate")
  }
}
