package graft

import graft.ops.{Bpe, LanguageModel, ModelIO, TextClassifier}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch-trained models applied inside Structured Streaming — the
  * train-once / apply-forever deployment shape: vocabulary, weights and
  * codebooks are driver values broadcast into stateless maps, so the
  * SAME operator code runs per micro-batch with no modification and no
  * state store. Parity contract: streaming output == the batch operator
  * on the union of the batches.
  */
class StreamingModelApplySpec extends SparkSpec {
  import spark.implicits._

  private case class D(doc_id: Long, text: String)

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("classifier predictions per micro-batch == batch predictions (via save/load)") {
    implicit val sqlCtx = spark.sqlContext
    val planted = docs.select($"doc_id", $"text")
      .withColumn("label", concat(lit("c"), $"doc_id" % 2))
      .withColumn("text", concat($"text",
        when($"doc_id" % 2 === 0, lit(" qqeven qqeven")).otherwise(lit(" qqodd qqodd"))))
    val m = TextClassifier.train(planted, "label", iters = 5)
    val p = java.nio.file.Files.createTempDirectory("graft_smas").toString + "/clf"
    ModelIO.saveClassifier(spark, m, p)
    val loaded = ModelIO.loadClassifier(spark, p)

    val rows = planted.select($"doc_id", $"text").as[(Long, String)].collect()
    val source = MemoryStream[(Long, String)]
    val stream = TextClassifier.predict(
      source.toDS().toDF("doc_id", "text"), loaded)
    val q = stream.writeStream.format("memory").queryName("clf_stream")
      .outputMode(OutputMode.Append()).start()
    source.addData(rows.take(200).toIndexedSeq: _*)
    q.processAllAvailable()
    source.addData(rows.drop(200).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("clf_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val batch = TextClassifier.predict(planted, m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(streamed == batch)
  }

  test("LM scoring and BPE encoding run stateless on a stream, equal batch") {
    implicit val sqlCtx = spark.sqlContext
    val vocab = LanguageModel.vocabulary(docs, minCount = 2).localCheckpoint()
    val bpe = Bpe.train(docs, vocabSize = 200, maxWords = 2000)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()

    val source = MemoryStream[(Long, String)]
    val in = source.toDS().toDF("doc_id", "text")
    val q1 = LanguageModel.scoreDocs(in, vocab)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode(OutputMode.Append()).start()
    val q2 = Bpe.encode(in, bpe).select($"doc_id", $"n_tokens")
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode(OutputMode.Append()).start()
    source.addData(rows.toIndexedSeq: _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    val lmStreamed = spark.table("lm_stream")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val bpeStreamed = spark.table("bpe_stream")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchLm = LanguageModel.scoreDocs(docs, vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val batchBpe = Bpe.encode(docs, bpe)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(lmStreamed == batchLm)
    assert(bpeStreamed == batchBpe)
  }
}
