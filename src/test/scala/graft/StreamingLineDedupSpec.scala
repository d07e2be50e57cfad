package graft

import graft.ops.LineDedup
import graft.streaming.StreamingLineDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingLineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  test("streaming output equals the batch keep-one rule on the batch-split corpus") {
    // boilerplate-injected real corpus so cross-batch duplicate lines exist
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", concat_ws("\n",
        when($"doc_id" % 3 === 0, lit("subscribe now")),
        $"text", lit("all rights reserved")).as("text"))
    val expected = LineDedup.removeDuplicatedLines(real)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val sld = new StreamingLineDedup(spark, tmp("graft_sline"))
    val batches = Seq(
      real.filter($"doc_id" < 30),
      real.filter($"doc_id" >= 30 && $"doc_id" < 70),
      real.filter($"doc_id" >= 70))
    val got = batches.zipWithIndex.flatMap { case (b, i) =>
      sld.cleanBatch(b, i.toLong).collect().map(r => (r.getLong(0), r.getString(1)))
    }.toSet
    assert(got == expected)
    // the injected footer really crossed batches: only one copy survives
    assert(got.count(_._2.contains("all rights reserved")) == 1)
  }

  test("cross-batch copy is cut; earlier canonical and blank lines stay") {
    val sld = new StreamingLineDedup(spark, tmp("graft_sline2"))
    val b0 = sld.cleanBatch(docs(1L -> "footer line\nunique zero"), 0L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(b0.toSeq == Seq((1L, "footer line\nunique zero")))
    val b1 = sld.cleanBatch(docs(2L -> "unique one\n\nfooter line"), 1L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(b1.toSeq == Seq((2L, "unique one\n")))
  }

  test("batch retry is idempotent") {
    val sld = new StreamingLineDedup(spark, tmp("graft_sline3"))
    val b = docs(1L -> "footer line\nunique zero")
    val first = sld.cleanBatch(b, 0L).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val retry = sld.cleanBatch(b, 0L).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(retry == first && first == Set((1L, "footer line\nunique zero")))
  }

  test("foreachBatch sink lands retry-safe batch dirs") {
    implicit val sqlCtx = spark.sqlContext
    val sld = new StreamingLineDedup(spark, tmp("graft_sline4"))
    val out = tmp("graft_sline_out")
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = source.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmp("graft_sline_ckpt"))
      .foreachBatch(sld.sink(out))
      .start()
    source.addData((1L, "dup line\na"), (2L, "dup line\nb"))
    q.processAllAvailable()
    source.addData((3L, "dup line\nc"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$out/batch=*")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "dup line\na"), (2L, "b"), (3L, "c")))
  }
}
