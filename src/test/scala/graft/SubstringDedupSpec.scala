package graft

import graft.ops.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // Tokens are single letters so offsets are easy to eyeball. The
  // shared run "p q r s t u" is 6 tokens; with minTokens=4 its three
  // 4-windows are duplicated in both docs and must merge to one span.
  private val docs = Seq(
    (1L, "a b c p q r s t u d e f"),
    (2L, "x y p q r s t u z w v k"),
    (3L, "m n o aa bb cc dd ee ff gg")).toDF("doc_id", "text")

  test("duplicated spans: shared run merges to one maximal span per doc") {
    val spans = SubstringDedup.duplicatedSpans(docs, minTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: tokens 3..8 inclusive -> [3, 9); doc 2: tokens 2..7 -> [2, 8).
    assert(spans.toSeq == Seq((1L, 3L, 9L, 3L), (2L, 2L, 8L, 3L)))
  }

  test("brute force parity on the real corpus") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    val w = 8
    val got = SubstringDedup.duplicatedSpans(real, minTokens = w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // Driver-side recompute: group windows by CONTENT (not hash), merge.
    val raw = real.select($"doc_id", $"text").as[(Long, String)].collect()
    val wins = raw.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+")
      (0 to t.length - w).map(s => (id, s, t.slice(s, s + w).mkString(" ")))
    }
    val dupKeys = wins.groupBy(_._3).filter(_._2.length >= 2).keySet
    val expected = wins.filter(x => dupKeys(x._3))
      .groupBy(_._1)
      .flatMap { case (id, ws) =>
        val starts = ws.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
        starts.foreach { s =>
          if (spans.nonEmpty && s <= spans.last._2) {
            val (a, _, c) = spans.last
            spans(spans.length - 1) = (a, s + w, c + 1)
          } else spans += ((s, s + w, 1))
        }
        spans.map(sp => (id, sp._1.toLong, sp._2.toLong, sp._3.toLong))
      }
      .toSet
    assert(got == expected)
    assert(got.nonEmpty) // the corpus has injected near-dup docs
  }

  test("keep-one removal: canonical occurrence survives, copy is cut") {
    val cleaned = SubstringDedup.removeDuplicatedSpans(docs, minTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // Canonical = smallest (doc_id, start): doc 1 keeps the run.
    assert(cleaned(0) == ((1L, "a b c p q r s t u d e f", 0L)))
    assert(cleaned(1) == ((2L, "x y z w v k", 6L)))
    assert(cleaned(2) == ((3L, "m n o aa bb cc dd ee ff gg", 0L)))
  }

  test("documents shorter than the window pass through untouched") {
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(tiny, minTokens = 4).count() == 0)
    val out = SubstringDedup.removeDuplicatedSpans(tiny, minTokens = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a b", 0L), (2L, "a b", 0L)))
  }

  test("window fingerprinting is shuffle-free") {
    val plan = SubstringDedup
      .windowFingerprints(docs, minTokens = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
