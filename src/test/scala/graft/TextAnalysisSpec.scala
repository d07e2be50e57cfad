package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("language-ID heuristic on real sentences") {
    assert(TextAnalysis.detectLanguage("the quick brown fox jumps over the lazy dog and it was fine") == "en")
    assert(TextAnalysis.detectLanguage("der schnelle braune Fuchs springt über den faulen Hund und das ist gut") == "de")
    assert(TextAnalysis.detectLanguage("le renard brun rapide saute par-dessus le chien paresseux dans la nuit") == "fr")
    assert(TextAnalysis.detectLanguage("el zorro marrón rápido salta sobre el perro perezoso y es bueno") == "es")
    assert(TextAnalysis.detectLanguage("敏捷的棕色狐狸跳过懒狗") == "zh")
    assert(TextAnalysis.detectLanguage("") == "und")
    assert(TextAnalysis.detectLanguage("12345 67890 !!!") == "und")
  }

  test("analyze: token/punct/stopword columns") {
    val df = Seq((1L, "The cat, the dog; and a bird.")).toDF("doc_id", "text")
    val row = TextAnalysis.analyze(df).collect().head
    assert(row.getAs[Long]("n_tokens") == 7L)
    assert(row.getAs[Long]("n_punct") == 3L) // , ; .
    // stopwords: the, the, and, a -> 4/7
    assert(math.abs(row.getAs[Double]("stopword_ratio") - math.round(4.0 / 7 * 10000) / 10000.0) < 1e-9)
  }

  test("quality score in [0,1] and orders degenerate below normal text") {
    val df = Seq(
      (1L, "A well formed sentence with the usual structure and plenty of ordinary readable words in it for scoring purposes here today now."),
      (2L, "x")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("repetition signals: hand-computed fractions, short-doc safety") {
    val df = Seq(
      (1L, "a b a b c"), // 5 toks/3 distinct; bigrams {ab,ba,ab,bc}; trigrams all distinct
      (2L, "x"),         // too short for any n-gram
      (3L, "go go go go")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionSignals(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("dup_token_frac"),
         r.getAs[Double]("dup_bigram_frac"), r.getAs[Double]("dup_trigram_frac"))).toMap
    assert(m(1L) == ((5L, 0.4, 0.25, 0.0)))
    assert(m(2L) == ((1L, 0.0, 0.0, 0.0)))
    assert(m(3L) == ((4L, 0.75, round3(2.0 / 3), 0.5)))
  }

  private def round3(d: Double): Double = math.round(d * 10000) / 10000.0

  test("chunking: full coverage, stride overlap, short-doc single chunk") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val rows = TextAnalysis.chunk(df, width = 4, stride = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[String]("chunk_text"), r.getAs[Long]("n_chunk_tokens"))).toMap
    assert(rows((1L, 0L)) == (("a b c d", 4L)))
    assert(rows((1L, 1L)) == (("c d e f", 4L)))
    assert(rows((1L, 2L)) == (("e f g h", 4L)))
    assert(rows((1L, 3L)) == (("g h i j", 4L))) // last chunk reaches the final token
    assert(rows((2L, 0L)) == (("x y", 2L)))     // short doc: one whole-doc chunk
    assert(rows.size == 5)
    // every token of doc 1 appears in some chunk
    val covered = rows.collect { case ((1L, _), (txt, _)) => txt.split(" ") }.flatten.toSet
    assert(covered == "a b c d e f g h i j".split(" ").toSet)
  }

  test("chunking invariants on random (n, width, stride) configurations") {
    val rnd = new scala.util.Random(5)
    val configs = Seq.fill(12)((1 + rnd.nextInt(80), 1 + rnd.nextInt(20)))
      .map { case (n, w) => (n, w, 1 + rnd.nextInt(w)) }
    configs.foreach { case (n, width, stride) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val rows = TextAnalysis.chunk(df, width, stride).collect()
        .map(r => (r.getAs[Long]("chunk_id"), r.getAs[String]("chunk_text")))
        .sortBy(_._1)
      val expectChunks = if (n <= width) 1 else (n - width + stride - 1) / stride + 1
      assert(rows.length == expectChunks, s"($n,$width,$stride): ${rows.length}")
      // every token covered; last chunk reaches the final token
      val covered = rows.flatMap(_._2.split(" ")).toSet
      assert(covered == (1 to n).map(i => s"t$i").toSet, s"($n,$width,$stride) coverage")
      assert(rows.last._2.split(" ").last == s"t$n", s"($n,$width,$stride) tail")
      // chunk i starts at token i*stride + 1
      rows.foreach { case (i, txt) =>
        assert(txt.split(" ").head == s"t${i * stride + 1}", s"($n,$width,$stride) chunk $i")
      }
    }
  }

  test("keyed chunks: chunk_key is collision-free and invertible") {
    val df = Seq((5L, "a b c d e f"), (9L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.keyedChunks(df, width = 2, stride = 2, maxChunks = 100L)
      .select($"chunk_key", $"doc_id", $"chunk_id").as[(Long, Long, Long)].collect()
    assert(got.map(_._1).distinct.length == got.length)
    got.foreach { case (key, doc, cid) =>
      assert(key / 100L == doc && key % 100L == cid, s"key $key not invertible")
    }
  }

  test("keyed chunks: key overflow fails loudly, not with a generic ANSI error") {
    val df = Seq((Long.MaxValue / 10L, "a b")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.keyedChunks(df, width = 1, stride = 1, maxChunks = 100L).collect()
    }
    assert(e.getMessage.contains("chunk_key out of range"), e.getMessage)
  }

  test("keyed chunks: negative doc_id fails loudly (truncating division un-inverts it)") {
    // doc -1, chunk 5 would key to -95 under maxChunks=100, and
    // -95 / 100 = 0 on the JVM — NOT -1. The guard must refuse rather
    // than hand out a key whose documented inversion is wrong.
    val df = Seq((-1L, "a b c d e f")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.keyedChunks(df, width = 1, stride = 1, maxChunks = 100L).collect()
    }
    assert(e.getMessage.contains("chunk_key out of range"), e.getMessage)
    // Long.MinValue used to blow the guard itself up (abs overflow
    // throws the generic ANSI error the guard exists to pre-empt).
    val dfMin = Seq((Long.MinValue, "a b")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      TextAnalysis.keyedChunks(dfMin, width = 1, stride = 1, maxChunks = 100L).collect()
    }
    assert(e2.getMessage.contains("chunk_key out of range"), e2.getMessage)
  }

  test("fingerprint: deterministic, order- and edit-sensitive") {
    assert(TextAnalysis.fingerprint("a b c") == TextAnalysis.fingerprint("a b c"))
    assert(TextAnalysis.fingerprint("a b c") != TextAnalysis.fingerprint("c b a"))
    assert(TextAnalysis.fingerprint("a b c") != TextAnalysis.fingerprint("a b d"))
  }

  test("operators run over the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(TextAnalysis.analyze(docs).count() == docs.count())
    assert(TextAnalysis.languageId(docs).count() == docs.count())
    assert(TextAnalysis.fingerprints(docs).select("fp").distinct().count() == docs.count())
  }

  test("PII scan counts injected markers; scrub removes every match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at a.b+c@mail.example.org or see https://x.io/p?q=1 thanks"),
      (2L, "two mails x@y.co z@w.org one url http://plain.net/x"),
      (3L, "nothing personal here")).toDF("doc_id", "text")
    val scan = TextAnalysis.piiScan(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(scan(1L) == ((1L, 1L)) && scan(2L) == ((2L, 1L)) && scan(3L) == ((0L, 0L)))

    val scrubbed = TextAnalysis.scrubPii(docs)
    val rescan = TextAnalysis.piiScan(scrubbed)
      .agg(org.apache.spark.sql.functions.sum($"n_emails" + $"n_urls")).head().getLong(0)
    assert(rescan == 0L, "scrub left PII behind")
    assert(scrubbed.filter($"doc_id" === 2L).head().getString(1).contains("<EMAIL>"))
  }
}
