package graft

import graft.ops.{Bpe, ModelIO, ProductQuantization => PQ, TextClassifier}
import org.apache.spark.sql.functions._

class ModelIOSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mio_$name").toString + "/m"

  test("BPE model: save/load round trip preserves every encoding") {
    val m = Bpe.train(docs, vocabSize = 200, maxWords = 2000)
    val p = tmp("bpe")
    ModelIO.saveBpe(spark, m, p)
    val m2 = ModelIO.loadBpe(spark, p)
    assert(m2.merges == m.merges)
    // Encodings (the behavioral surface) are identical.
    val a = Bpe.encode(docs, m).select($"doc_id", $"tokens")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = Bpe.encode(docs, m2).select($"doc_id", $"tokens")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
  }

  test("classifier: save/load round trip preserves every prediction") {
    val planted = docs.select($"doc_id", $"text")
      .withColumn("label", concat(lit("c"), $"doc_id" % 2))
      .withColumn("text", concat($"text",
        when($"doc_id" % 2 === 0, lit(" qqeven qqeven")).otherwise(lit(" qqodd qqodd"))))
    val m = TextClassifier.train(planted, "label", iters = 5)
    val p = tmp("clf")
    ModelIO.saveClassifier(spark, m, p)
    val m2 = ModelIO.loadClassifier(spark, p)
    assert(m2.labels == m.labels && m2.nBuckets == m.nBuckets)
    m.w.zip(m2.w).foreach { case (x, y) => assert(x.sameElements(y)) }
    val a = TextClassifier.predict(planted, m).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = TextClassifier.predict(planted, m2).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("PCA model: save/load round trip preserves every projection") {
    val m = graft.ops.Pca.fit(embs, k = 8)
    val p = tmp("pca")
    ModelIO.savePca(spark, m, p)
    val m2 = ModelIO.loadPca(spark, p)
    assert(m.mean.sameElements(m2.mean))
    assert(m.eigenvalues.sameElements(m2.eigenvalues))
    m.components.zip(m2.components).foreach { case (x, y) => assert(x.sameElements(y)) }
    val a = graft.ops.Pca.transform(embs, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = graft.ops.Pca.transform(embs, m2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }

  test("PQ codebooks: save/load round trip preserves every code") {
    val books = PQ.trainCodebooks(embs, m = 8, codes = 16, iters = 2)
    val p = tmp("pq")
    ModelIO.savePqCodebooks(spark, books, p)
    val books2 = ModelIO.loadPqCodebooks(spark, p)
    assert(books.length == books2.length)
    for (s <- books.indices; c <- books(s).indices)
      assert(books(s)(c).sameElements(books2(s)(c)), s"codeword ($s,$c) drifted")
    val a = PQ.encode(embs, books).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = PQ.encode(embs, books2).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }
}
