package graft

import graft.ops.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // doc 0: footer + a unique line + footer AGAIN (within-doc repeat)
    (0L, "all rights reserved\nalpha unique zero\nall rights reserved"),
    // doc 1: unique line + footer (cross-doc repeat, later occurrence)
    (1L, "beta unique one\nall rights reserved"),
    // doc 2: whitespace-padded footer still matches (trimmed identity);
    // blank line must never be treated as duplicated
    (2L, "  all rights reserved  \n\ngamma unique two"),
    // doc 3: untouched — must round-trip byte-identically
    (3L, "delta unique three\n  padded but unique  "),
    // doc 4: ALL boilerplate — survives as the empty string
    (4L, "all rights reserved")
  ).toDF("doc_id", "text")

  test("duplicatedLines flags every occurrence, keeper is min (doc, idx)") {
    val flags = LineDedup.duplicatedLines(docs)
      .orderBy("doc_id", "line_idx")
      .as[(Long, Int, Long, Boolean)].collect().toList
    // 'all rights reserved' occurs at (0,0) (0,2) (1,1) (2,0) (4,0):
    // cnt 5 everywhere, kept only at (0,0).
    assert(flags == List(
      (0L, 0, 5L, true), (0L, 2, 5L, false), (1L, 1, 5L, false),
      (2L, 0, 5L, false), (4L, 0, 5L, false)))
  }

  test("removeDuplicatedLines: keep-one rebuild, blanks and order preserved") {
    val clean = LineDedup.removeDuplicatedLines(docs)
      .as[(Long, String)].collect().toMap
    assert(clean(0L) == "all rights reserved\nalpha unique zero")
    assert(clean(1L) == "beta unique one")
    // doc 2 loses its padded footer but keeps the blank line and order
    assert(clean(2L) == "\ngamma unique two")
    // untouched doc round-trips byte-identically (padding intact)
    assert(clean(3L) == "delta unique three\n  padded but unique  ")
    // all-boilerplate doc is kept as an empty string, not dropped
    assert(clean(4L) == "")
  }

  test("minCount threshold: lines below it are untouched") {
    val two = Seq(
      (0L, "twice\nunique a"), (1L, "twice\nunique b"),
      (2L, "thrice\nx"), (3L, "thrice\ny"), (4L, "thrice\nz")
    ).toDF("doc_id", "text")
    val flags = LineDedup.duplicatedLines(two, minCount = 3)
      .select($"doc_id", $"line_idx").as[(Long, Int)].collect().toSet
    assert(flags == Set((2L, 0), (3L, 0), (4L, 0)))
    val clean = LineDedup.removeDuplicatedLines(two, minCount = 3)
      .as[(Long, String)].collect().toMap
    assert(clean(0L) == "twice\nunique a" && clean(1L) == "twice\nunique b")
    assert(clean(2L) == "thrice\nx" && clean(3L) == "y" && clean(4L) == "z")
  }

  test("paragraph granularity: duplicated paragraphs keep one copy, round trip exact") {
    val para = Seq(
      (0L, "intro text here\n\nShared disclaimer paragraph.\n\nbody zero"),
      (1L, "other intro\n\nShared disclaimer paragraph.\n\nbody one"),
      // single-newline lines inside one paragraph stay intact
      (2L, "line a\nline b\n\nunique closing")
    ).toDF("doc_id", "text")
    val clean = LineDedup.removeDuplicatedParagraphs(para)
      .as[(Long, String)].collect().toMap
    assert(clean(0L) == "intro text here\n\nShared disclaimer paragraph.\n\nbody zero")
    assert(clean(1L) == "other intro\n\nbody one")
    assert(clean(2L) == "line a\nline b\n\nunique closing")
  }

  test("deterministic under repartition") {
    val parts = docs.repartition(7)
    val a = LineDedup.removeDuplicatedLines(docs).orderBy("doc_id").collect().toSeq
    val b = LineDedup.removeDuplicatedLines(parts).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("randomized: keep-one removal matches a driver-side reference on 40 corpora") {
    val rng = new scala.util.Random(77)
    for (trial <- 0 until 40) {
      val nDocs = 1 + rng.nextInt(12)
      val alphabet = Vector("aa", "bb", "cc", " dd ", "", "ee ff")
      val corpus = (0L until nDocs.toLong).map { id =>
        val n = rng.nextInt(6)
        (id, (0 until n).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString("\n"))
      }
      // reference: count trimmed non-blank lines, keep first occurrence
      val occs = corpus.flatMap { case (id, t) =>
        t.split("\n", -1).zipWithIndex.map { case (l, i) => (id, i, l, l.trim) }
      }
      val counts = occs.filter(_._4.nonEmpty).groupBy(_._4).map { case (k, v) => k -> v.size }
      val keeper = occs.filter(_._4.nonEmpty).groupBy(_._4)
        .map { case (k, v) => k -> v.map(o => (o._1, o._2)).min }
      val expect = corpus.map { case (id, t) =>
        val kept = t.split("\n", -1).zipWithIndex.filter { case (l, i) =>
          val n = l.trim
          n.isEmpty || counts(n) < 2 || keeper(n) == ((id, i))
        }.map(_._1)
        (id, kept.mkString("\n"))
      }.toMap
      val got = LineDedup.removeDuplicatedLines(corpus.toDF("doc_id", "text"))
        .as[(Long, String)].collect().toMap
      assert(got == expect, s"trial $trial corpus=$corpus")
    }
  }

  test("real corpus: flags agree with a content-grouped recompute") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", concat_ws("\n",
        when($"doc_id" % 3 === 0, lit("subscribe to our newsletter")),
        $"text", lit("all rights reserved")).as("text"))
    val flags = LineDedup.duplicatedLines(real)
    // content-grouped (hash-free) recompute — agreement is also a
    // collision check on the xxhash64 plan key
    val l = LineDedup.lines(real).where($"norm" =!= "")
    val byContent = l.groupBy($"norm")
      .agg(count(lit(1)).as("cnt"),
        min(struct($"doc_id", $"line_idx")).as("k"))
      .where($"cnt" >= 2)
    val expect = l.join(byContent, "norm")
      .select($"doc_id", $"line_idx", $"cnt",
        ($"k.doc_id" === $"doc_id" && $"k.line_idx" === $"line_idx").as("kept"))
    assert(flags.count() > 0)
    assert(flags.exceptAll(expect).isEmpty && expect.exceptAll(flags).isEmpty)
  }
}
