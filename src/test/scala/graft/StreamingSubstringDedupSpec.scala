package graft

import graft.ops.SubstringDedup
import graft.streaming.StreamingSubstringDedup
import org.apache.spark.sql.DataFrame

class StreamingSubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  test("streaming output equals the batch keep-one rule on the batch-split real corpus") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val w = 8
    val expected = SubstringDedup.removeDuplicatedSpans(real, minTokens = w)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val ssd = new StreamingSubstringDedup(spark, tmp("graft_ssub"), minTokens = w)
    // doc_ids are arrival-ordered across the three batches — the
    // documented condition for exact prefix parity.
    val batches = Seq(
      real.filter($"doc_id" < 30),
      real.filter($"doc_id" >= 30 && $"doc_id" < 70),
      real.filter($"doc_id" >= 70))
    val got = batches.zipWithIndex.flatMap { case (b, i) =>
      ssd.cleanBatch(b, i.toLong)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    }.toSet
    assert(got == expected)
    assert(got.exists(_._3 > 0)) // the corpus really has cross-batch dups
  }

  test("cross-batch copy is cut; the earlier canonical stays intact") {
    val ssd = new StreamingSubstringDedup(spark, tmp("graft_ssub2"), minTokens = 4)
    val b0 = ssd.cleanBatch(docs(1L -> "a b c p q r s t u d e f"), 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(b0.toSeq == Seq((1L, "a b c p q r s t u d e f", 0L)))
    val b1 = ssd.cleanBatch(docs(2L -> "x y p q r s t u z w v k"), 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(b1.toSeq == Seq((2L, "x y z w v k", 6L)))
  }

  test("batch retry is idempotent: re-running a batch cannot see its own state") {
    val ssd = new StreamingSubstringDedup(spark, tmp("graft_ssub3"), minTokens = 4)
    val b = docs(1L -> "a b c p q r s t u d e f")
    val first = ssd.cleanBatch(b, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // Redelivery of the same batch id: state from the failed attempt
    // is overwritten, not joined against — output identical.
    val retry = ssd.cleanBatch(b, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(retry == first)
    assert(first == Set((1L, "a b c p q r s t u d e f", 0L)))
  }

  test("sink lands per-batch cleaned parquet") {
    val out = tmp("graft_ssub_out")
    val ssd = new StreamingSubstringDedup(spark, tmp("graft_ssub4"), minTokens = 4)
    val sink = ssd.sink(out)
    sink(docs(1L -> "a b c p q r s t u d e f"), 0L)
    sink(docs(2L -> "x y p q r s t u z w v k"), 1L)
    val got = spark.read.parquet(s"$out/batch=1")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"))).toSet
    assert(got == Set((2L, "x y z w v k")))
  }
}
