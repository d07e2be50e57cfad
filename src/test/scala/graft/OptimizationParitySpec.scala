package graft

import graft.ops.{Bm25Index, Dedup}
import org.apache.spark.sql.functions._

/** Focused parity contracts for the r15 operator-internal rewrites —
  * each optimization that changed HOW a quantity is computed gets its
  * old definition re-derived here and compared exactly.
  */
class OptimizationParitySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta beta gamma", "s1"),
    (2L, "beta", "s2"),
    (3L, "  gamma   gamma alpha  ", "s1"),
    (4L, "", "s2"), // empty text still tokenizes to one "" token
    (5L, "delta epsilon zeta delta delta", "s3"))
    .toDF("doc_id", "text", "source")

  test("postingsOf: dl = size(tokens) equals the old sum-of-tf-per-doc, meta rides") {
    val posts = Bm25Index.postingsOf(corpus, "text", "doc_id", Seq("source"))
    // old definition: dl(doc) = sum of tf over the doc's postings
    val oldDl = posts.groupBy($"doc_id").agg(sum($"tf").as("old_dl"))
    val mismatch = posts.join(oldDl, "doc_id").filter($"dl" =!= $"old_dl").count()
    assert(mismatch == 0L, "dl must equal the per-doc tf sum exactly")
    // meta columns are denormalized onto every posting, unchanged
    val badMeta = posts.join(corpus.select($"doc_id", $"source".as("src")), "doc_id")
      .filter($"source" =!= $"src").count()
    assert(badMeta == 0L)
    // schema/order contract the writers rely on
    assert(posts.columns.toSeq == Seq("term", "doc_id", "tf", "dl", "source"))
  }

  test("minhashFromShingles: signatures bit-identical to the direct text path") {
    val direct = Dedup.minhashSignatures(corpus, "text", "doc_id")
      .as[(Long, Seq[Long])].collect().toMap
    val viaShingles = Dedup.minhashFromShingles(Dedup.shingles(corpus, "text", "doc_id"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(direct.keySet == viaShingles.keySet)
    direct.foreach { case (id, sig) =>
      assert(viaShingles(id) == sig, s"signature mismatch for doc $id")
    }
  }
}
