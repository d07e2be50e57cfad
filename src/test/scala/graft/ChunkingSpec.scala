package graft

import graft.ops.Chunking

/** Sliding token windows: hand-computed chunk goldens, overlap
  * arithmetic, short/empty docs, key invertibility, overflow guard.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("hand golden: size 4, overlap 1 (stride 3)") {
    val d = Seq((7L, "a b c d e f g h")).toDF("doc_id", "text") // 8 tokens
    val got = Chunking.tokenWindows(d, size = 4, overlap = 1)
      .select($"chunk_id", $"chunk_start", $"n_toks", $"text")
      .as[(Long, Long, Long, String)].collect().toSet
    // starts 0, 3, 6 (< 8)
    assert(got == Set(
      (0L, 0L, 4L, "a b c d"),
      (1L, 3L, 4L, "d e f g"),
      (2L, 6L, 2L, "g h")), s"golden mismatch: $got")
  }

  test("no overlap: chunks partition the token stream exactly") {
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val got = Chunking.tokenWindows(d, size = 5)
      .orderBy($"chunk_id").select($"text").as[String].collect()
    assert(got.length == 5) // ceil(23/5)
    assert(got.mkString(" ") == text, "stride=size chunks must reassemble the doc")
  }

  test("short and empty docs yield exactly one chunk") {
    val d = Seq((1L, "only three tokens"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = Chunking.tokenWindows(d, size = 10, overlap = 3)
      .select($"doc_id", $"n_toks", $"text").as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.toSet).toMap
    assert(got(1L) == Set((1L, 3L, "only three tokens")))
    // empty text tokenizes to [""] — one empty chunk, the BM25 identity
    assert(got(2L) == Set((2L, 1L, "")))
    assert(got(3L) == Set((3L, 1L, "")))
  }

  test("keyed chunks: chunk_key is collision-free and invertible") {
    val d = Seq((5L, "a b c d e f"), (9L, "x y")).toDF("doc_id", "text")
    val got = Chunking.keyedTokenWindows(d, size = 2, maxChunks = 100L)
      .select($"chunk_key", $"doc_id", $"chunk_id").as[(Long, Long, Long)].collect()
    assert(got.map(_._1).distinct.length == got.length)
    got.foreach { case (key, doc, cid) =>
      assert(key / 100L == doc && key % 100L == cid, s"key $key not invertible")
    }
  }

  test("key overflow fails loudly") {
    val d = Seq((Long.MaxValue / 10L, "a b")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Chunking.keyedTokenWindows(d, size = 1, maxChunks = 100L).collect()
    }
    assert(e.getMessage.contains("chunk_key overflow"), e.getMessage)
  }

  test("bad params fail loudly") {
    val d = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.tokenWindows(d, size = 0))
    intercept[IllegalArgumentException](Chunking.tokenWindows(d, size = 4, overlap = 4))
    intercept[IllegalArgumentException](Chunking.tokenWindows(d, size = 4, overlap = -1))
  }
}
