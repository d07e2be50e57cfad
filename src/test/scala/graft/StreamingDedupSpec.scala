package graft

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first arrival wins within and across micro-batches; normalization matches batch dedup") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = StreamingDedup.firstArrivals(source.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()

    // Batch 1: two in-batch duplicates (normalization: case+whitespace),
    // one unique.
    source.addData(
      Doc(10L, "Hello   world FOO"),
      Doc(3L, " hello world foo "),
      Doc(7L, "something else"))
    q.processAllAvailable()
    // Batch 2: cross-batch duplicate of batch 1 + a fresh doc.
    source.addData(Doc(99L, "hello world foo"), Doc(8L, "brand new"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").as[Doc].collect().sortBy(_.docId)
    // In-batch tie -> min docId (3); cross-batch dup (99) dropped.
    assert(out.map(_.docId).toSeq == Seq(3L, 7L, 8L))
  }

  test("TTL: duplicates drop within the window, evicted fingerprints re-admit after expiry") {
    import graft.streaming.StreamingDedup.TimedDoc
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val source = MemoryStream[TimedDoc]
    val q = StreamingDedup
      .firstArrivalsWithTtl(source.toDS(), java.time.Duration.ofSeconds(30))
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode(OutputMode.Append())
      .start()

    // Batch 1: 'hello' admitted (min docId wins the in-batch tie).
    source.addData(TimedDoc(1L, ts(10), "hello"), TimedDoc(2L, ts(11), "hello"))
    q.processAllAvailable()
    // Batch 2: duplicate within TTL (watermark 11 < 11+30) -> dropped;
    // fresh doc admitted. Afterwards the watermark advances to 100.
    source.addData(TimedDoc(3L, ts(20), "hello"), TimedDoc(4L, ts(100), "other"))
    q.processAllAvailable()
    // Batch 3: unrelated traffic; during it the engine sees watermark
    // 100 > 20+30, so 'hello' is evicted.
    source.addData(TimedDoc(5L, ts(200), "unrelated"))
    q.processAllAvailable()
    // Batch 4: 'hello' arrives after eviction -> re-admitted.
    source.addData(TimedDoc(6L, ts(201), "hello"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_ttl_out").as[TimedDoc].collect().map(_.docId).sorted
    assert(out.toSeq == Seq(1L, 4L, 5L, 6L),
      s"TTL dedup emitted ${out.toSeq} (expected drop of 2,3 and re-admit of 6)")
  }

  test("fingerprint: normalization-invariant, distinct for distinct text") {
    assert(StreamingDedup.fingerprint("A  b\tC") == StreamingDedup.fingerprint("a b c"))
    assert(StreamingDedup.fingerprint("a b c") != StreamingDedup.fingerprint("a b d"))
  }

  test("streaming kernel normalization equals batch normalizeText (incl. trailing newline)") {
    val cases = Seq("hello", "hello\n", " hello  WORLD\t", "ab", "  x ")
    val batch = cases.toDF("text")
      .select(graft.ops.Dedup.normalizeText($"text").as("n")).as[String].collect()
    val kernel = cases.map(StreamingDedup.normalize)
    assert(batch.toSeq == kernel,
      s"batch vs streaming normalization diverged: ${batch.toSeq} vs $kernel")
    // And the dedup decision agrees: 'hello' and 'hello\n' collapse.
    assert(StreamingDedup.fingerprint("hello") == StreamingDedup.fingerprint("hello\n"))
  }

  test("normalization keeps non-\\s control chars that String.trim would strip") {
    // U+0001 is <= U+0020 (String.trim eats it) but is not Java-\s, so
    // SQL regexp_replace('\\s+')+trim keeps it. Streaming must agree.
    val cases = Seq("\u0001abc ", " abc\u0001", "\u0001 abc \u0001")
    val batch = cases.toDF("text")
      .select(graft.ops.Dedup.normalizeText($"text").as("n")).as[String].collect()
    val kernel = cases.map(StreamingDedup.normalize)
    assert(batch.toSeq == kernel,
      s"control-char divergence: ${batch.toSeq.map(_.toList)} vs ${kernel.map(_.toList)}")
  }

  test("normalization is locale-independent (Turkish-I JVM default locale)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      // Default-locale toLowerCase would map 'I' -> dotless 'ı' here,
      // splitting batch and streaming dedup decisions; Locale.ROOT must not.
      assert(StreamingDedup.normalize("TITLE") == "title")
      assert(StreamingDedup.fingerprint("TITLE") == StreamingDedup.fingerprint("title"))
    } finally java.util.Locale.setDefault(prev)
  }
}
