package graft

import graft.ops.{AnnIndex, Bm25, Bm25Index, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hybrid serving composition: one call over the two persisted
  * indexes equals the manual lex + vec + RRF plumbing, and the shared
  * metadata predicate reaches both scans.
  */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_hybrid").toString

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def corpus(ids: Range): DataFrame =
    ids.map { i =>
      val n = 3 + (i * 7) % 9
      (i.toLong, (0 until n).map(j => words((i * 3 + j * j) % words.length)).mkString(" "),
        if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")

  private def vectors(ids: Range): DataFrame = {
    val rnd = new scala.util.Random(3)
    ids.map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1),
      if (i % 2 == 0) "en" else "de")).toDF("vec_id", "embedding", "lang")
  }

  test("hybridTopK equals the manual lex + vec + RRF composition") {
    val bmDir = tmpDir(); val annDir = tmpDir()
    val d = corpus(0 until 60); val v = vectors(0 until 60)
    Bm25Index.build(d, bmDir, nTb = 8)
    val kCells = AnnIndex.build(v, annDir, nClusters = 4, iters = 2)
    val hq = d.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"), $"text")
      .join(v.select($"vec_id".as("query_id"), $"embedding"), "query_id")
    val got = Retrieval.hybridTopK(spark, bmDir, annDir, hq,
        k = 5, depth = 10, nProbe = kCells)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val lex = Bm25Index.topDocs(spark, bmDir,
        hq.select($"query_id", $"text"), k = 10)
      .select($"query_id", $"doc_id", $"rank")
    val vec = AnnIndex.topK(spark, annDir,
        hq.select($"query_id".as("vec_id"), $"embedding"), k = 10, nProbe = kCells)
      .select($"query_id", $"neighbor_id".as("doc_id"), $"rank")
    val manual = Bm25.fuseTopK(Seq(lex, vec), k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == manual)
    assert(got.nonEmpty)
  }

  test("the lexical probe knobs pass through (k1/b/maxDfFrac/prune)") {
    val bmDir = tmpDir(); val annDir = tmpDir()
    val d = corpus(0 until 60); val v = vectors(0 until 60)
    Bm25Index.build(d, bmDir, nTb = 8)
    val kCells = AnnIndex.build(v, annDir, nClusters = 4, iters = 2)
    val hq = d.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"), $"text")
      .join(v.select($"vec_id".as("query_id"), $"embedding"), "query_id")
    val got = Retrieval.hybridTopK(spark, bmDir, annDir, hq,
        k = 5, depth = 10, nProbe = kCells,
        k1 = 1.2, b = 0.4, maxDfFrac = 0.6, prune = false)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val lex = Bm25Index.topDocs(spark, bmDir,
        hq.select($"query_id", $"text"), k = 10,
        k1 = 1.2, b = 0.4, maxDfFrac = 0.6, prune = false)
      .select($"query_id", $"doc_id", $"rank")
    val vec = AnnIndex.topK(spark, annDir,
        hq.select($"query_id".as("vec_id"), $"embedding"), k = 10, nProbe = kCells)
      .select($"query_id", $"neighbor_id".as("doc_id"), $"rank")
    val manual = Bm25.fuseTopK(Seq(lex, vec), k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == manual)
    assert(got.nonEmpty)
    // and the default-knob result must differ somewhere on this corpus,
    // or the passthrough assertion is vacuous
    val defaults = Retrieval.hybridTopK(spark, bmDir, annDir, hq,
        k = 5, depth = 10, nProbe = kCells)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(defaults != got,
      "non-default lexical knobs must change the fused ranking on this corpus")
  }

  test("the shared metadata predicate reaches both indexes") {
    val bmDir = tmpDir(); val annDir = tmpDir()
    val d = corpus(0 until 60); val v = vectors(0 until 60)
    Bm25Index.build(d, bmDir, nTb = 8, metaCols = Seq("lang"))
    val kCells = AnnIndex.build(v, annDir, nClusters = 4, iters = 2,
      metaCols = Seq("lang"))
    val hq = d.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"), $"text")
      .join(v.select($"vec_id".as("query_id"), $"embedding"), "query_id")
    val got = Retrieval.hybridTopK(spark, bmDir, annDir, hq,
        k = 20, depth = 20, nProbe = kCells, filter = Some($"lang" === "en"))
      .select($"doc_id").as[Long].collect()
    assert(got.nonEmpty)
    assert(got.forall(_ % 2 == 0), s"filter must hold on both sides: ${got.mkString(",")}")
  }
}
