package graft

import graft.ops.{Dedup, NearDupIndex}
import graft.streaming.StreamingNearDupIndex
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingest through the persisted LSH near-dup index:
  * per-batch survivors, cross-batch fuzzy filtering, and convergence
  * from the crash points — including the LSH-specific half-append
  * (postings without shingles), which must neither lose survivors nor
  * corrupt probe answers.
  */
class StreamingNearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String, String) = {
    n += 1
    val dir = java.nio.file.Files.createTempDirectory("graft_sndidx").toString
    (dir, s"graft_test_snd_idx_$n", s"$dir/survivors")
  }

  private def survivorIds(out: String): Set[Long] =
    spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet

  private val base: String = (1 to 60).map(i => s"tok$i").mkString(" ")

  test("streamed batches: fuzzy survivors per batch, near-dups filtered across batches") {
    val (dir, pfx, out) = fresh()
    NearDupIndex.build(Seq(1L -> base).toDF("doc_id", "text"), dir, pfx, nBuckets = 4)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingNearDupIndex
      .intoIndex(source.toDF().toDF("doc_id", "text"), pfx, out)
      .start()
    // batch 0: 10 ~= seed (dropped), 11 novel, 12 ~= 11 (batch-internal, keep 11)
    source.addData(Seq(
      10L -> (base + " extra"),
      11L -> "a novel page about lighthouse maintenance on remote northern islands",
      12L -> "a novel page about LIGHTHOUSE maintenance on remote northern islands"))
    q.processAllAvailable()
    // batch 1: 20 ~= batch-0 survivor (dropped), 21 novel
    source.addData(Seq(
      20L -> "a novel page about lighthouse maintenance on remote northern  islands",
      21L -> "completely different content concerning deep sea cable repairs"))
    q.processAllAvailable()
    q.stop()
    assert(survivorIds(s"$out/batch=0") == Set(11L))
    assert(survivorIds(s"$out/batch=1") == Set(21L))
    assert(spark.table(NearDupIndex.shinglesTable(pfx)).count() == 3) // seed, 11, 21
  }

  test("full redelivery of a committed batch is a no-op") {
    val (dir, pfx, out) = fresh()
    NearDupIndex.build(Seq(1L -> base).toDF("doc_id", "text"), dir, pfx, nBuckets = 4)
    val batch = Seq(30L -> "thing one entirely", 31L -> "thing two entirely").toDF("doc_id", "text")
    assert(StreamingNearDupIndex.ingestBatch(spark, pfx, out, batch, 5L))
    assert(!StreamingNearDupIndex.ingestBatch(spark, pfx, out, batch, 5L))
    assert(survivorIds(s"$out/batch=5") == Set(30L, 31L))
    assert(spark.table(NearDupIndex.shinglesTable(pfx)).count() == 3)
  }

  test("crash after append but before marker: retry keeps survivors, no duplicate shingles") {
    val (dir, pfx, out) = fresh()
    NearDupIndex.build(Seq(1L -> base).toDF("doc_id", "text"), dir, pfx, nBuckets = 4)
    val batch = Seq(40L -> "crash test page with plenty of distinct words in it").toDF("doc_id", "text")
    assert(StreamingNearDupIndex.ingestBatch(spark, pfx, out, batch, 8L))
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(out, "_index_done/8"), false))
    // retry: every row self-matches at J=1.0 -> empty re-append
    assert(StreamingNearDupIndex.ingestBatch(spark, pfx, out, batch, 8L))
    assert(survivorIds(s"$out/batch=8") == Set(40L))
    assert(spark.table(NearDupIndex.shinglesTable(pfx)).filter($"doc_id" === 40L).count() == 1)
  }

  test("half-append crash (postings without shingles): retry converges, compact retires dups") {
    val (dir, pfx, out) = fresh()
    NearDupIndex.build(Seq(1L -> base).toDF("doc_id", "text"), dir, pfx, nBuckets = 4)
    val batch = Seq(50L -> "partial append page where only postings landed before the crash")
      .toDF("doc_id", "text")
    // Construct the crash state: postings appended, shingles NOT.
    Dedup.bandBuckets(Dedup.minhashSignatures(batch))
      .select(xxhash64(col("band"), col("bucket")).as("bb"), col("doc_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
      .insertInto(NearDupIndex.bucketsTable(pfx))
    assert(spark.table(NearDupIndex.shinglesTable(pfx)).filter($"doc_id" === 50L).isEmpty)
    // Redelivery: doc 50 cannot self-verify (no shingles), so it is
    // still novel -> survivors written, BOTH tables appended.
    assert(StreamingNearDupIndex.ingestBatch(spark, pfx, out, batch, 9L))
    assert(survivorIds(s"$out/batch=9") == Set(50L))
    // probe answers are correct despite the duplicate postings rows
    val probe = Seq(60L -> "partial append page where only postings landed before the crash")
      .toDF("doc_id", "text")
    def pairs(): Set[(Long, Long)] = NearDupIndex.probePairs(spark, pfx, probe)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs() == Set((50L, 60L)))
    val dupPostings = spark.table(NearDupIndex.bucketsTable(pfx))
      .groupBy("bb", "doc_id").count().filter($"count" > 1).count()
    assert(dupPostings > 0, "crash state should have left duplicate postings")
    NearDupIndex.compact(spark, pfx, dir)
    assert(spark.table(NearDupIndex.bucketsTable(pfx))
      .groupBy("bb", "doc_id").count().filter($"count" > 1).isEmpty)
    assert(pairs() == Set((50L, 60L)))
  }
}
