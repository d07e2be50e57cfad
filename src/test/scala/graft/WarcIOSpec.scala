package graft

import graft.sources.WarcIO
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._

/** WARC crawl-archive reading: plain and per-record-gzip files, HTTP
  * response body extraction, corrupt-record resync, the oversize cap,
  * and the WARC → HTML → documents composition.
  */
class WarcIOSpec extends SparkSpec {
  import spark.implicits._

  private def record(
      wtype: String, uri: String, block: Array[Byte],
      id: String = "<urn:uuid:1>", date: String = "2026-08-14T00:00:00Z",
      contentLength: Option[Long] = None): Array[Byte] = {
    val len = contentLength.getOrElse(block.length.toLong)
    val head = s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Record-ID: $id\r\n" +
      s"WARC-Date: $date\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Length: $len\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes(UTF_8)); out.write(block); out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def httpResponse(body: String, status: Int = 200,
      ctype: String = "text/html"): Array[Byte] = {
    val b = body.getBytes(UTF_8)
    val head = s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${b.length}\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes(UTF_8)); out.write(b)
    out.toByteArray
  }

  private def writeFile(dir: String, name: String, parts: Seq[Array[Byte]],
      gzipPerRecord: Boolean = false): Unit = {
    val f = new FileOutputStream(s"$dir/$name")
    try parts.foreach { p =>
      if (gzipPerRecord) { // one gzip MEMBER per record, concatenated
        val gz = new GZIPOutputStream(f) { def finishOnly(): Unit = finish() }
        gz.write(p); gz.finishOnly(); gz.flush()
      } else f.write(p)
    } finally f.close()
  }

  private def tmpDir() = Files.createTempDirectory("graft_warc").toString

  test("plain WARC: info/request/response records parse; response body decoded") {
    val dir = tmpDir()
    writeFile(dir, "a.warc", Seq(
      record("warcinfo", "", "software: graft-test\r\n".getBytes(UTF_8)),
      record("request", "http://x.test/1", "GET /1 HTTP/1.1\r\n\r\n".getBytes(UTF_8)),
      record("response", "http://x.test/1", httpResponse("<p>hello world</p>"))))
    val df = WarcIO.read(spark, dir).cache()
    assert(df.count() == 3)
    assert(df.filter($"_corrupt").count() == 0)
    val resp = df.filter($"warc_type" === "response").collect().head
    assert(resp.getAs[String]("target_uri") == "http://x.test/1")
    assert(resp.getAs[Int]("http_status") == 200)
    assert(resp.getAs[String]("http_content_type") == "text/html")
    assert(new String(resp.getAs[Array[Byte]]("payload"), UTF_8) == "<p>hello world</p>")
    df.unpersist()
  }

  test("per-record gzip members read transparently (the Common Crawl layout)") {
    val dir = tmpDir()
    val recs = (1 to 5).map(i =>
      record("response", s"http://x.test/$i", httpResponse(s"<p>doc number $i</p>"),
        id = s"<urn:uuid:$i>"))
    writeFile(dir, "b.warc.gz", recs, gzipPerRecord = true)
    val got = WarcIO.readResponses(spark, dir)
      .select($"target_uri", $"html").as[(String, String)].collect().sorted
    assert(got.length == 5)
    assert(got.head == ("http://x.test/1", "<p>doc number 1</p>"))
    assert(got.last == ("http://x.test/5", "<p>doc number 5</p>"))
  }

  test("corrupt record (no Content-Length) is flagged; parser resyncs on the next record") {
    val dir = tmpDir()
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://bad.test/\r\n\r\n").getBytes(UTF_8) // no length
    writeFile(dir, "c.warc", Seq(
      bad,
      record("response", "http://good.test/", httpResponse("<p>still here</p>"))))
    val df = WarcIO.read(spark, dir).cache()
    assert(df.filter($"_corrupt").count() == 1)
    val good = df.filter(!$"_corrupt" && $"warc_type" === "response").collect()
    assert(good.length == 1 && good.head.getAs[String]("target_uri") == "http://good.test/")
    df.unpersist()
  }

  test("oversize record is skipped bounded and flagged; following record still reads") {
    val dir = tmpDir()
    val bigBody = "x" * 4096
    writeFile(dir, "d.warc", Seq(
      record("response", "http://big.test/", httpResponse(bigBody)),
      record("response", "http://small.test/", httpResponse("<p>small one</p>"))))
    val df = WarcIO.read(spark, dir, maxRecordBytes = 1024).cache()
    assert(df.filter($"_corrupt" && $"target_uri" === "http://big.test/").count() == 1)
    assert(df.filter(!$"_corrupt" && $"target_uri" === "http://small.test/").count() == 1)
    df.unpersist()
  }

  test("toDocuments: WARC -> HTML extraction -> curation-ready frame") {
    val dir = tmpDir()
    writeFile(dir, "e.warc", Seq(
      record("response", "http://site.test/a",
        httpResponse("<html><script>no()</script><p>keep these words</p></html>")),
      record("response", "http://site.test/404",
        httpResponse("<p>gone</p>", status = 404)),
      record("request", "http://site.test/a", "GET /a HTTP/1.1\r\n\r\n".getBytes(UTF_8))))
    val docs = WarcIO.toDocuments(spark, dir).collect()
    assert(docs.length == 1, "only status-200 responses become documents")
    val d = docs.head
    assert(d.getAs[String]("url") == "http://site.test/a")
    assert(d.getAs[String]("text") == "keep these words")
    // doc_id is the deterministic content hash.
    val expectId = Seq(("http://site.test/a",
        "<html><script>no()</script><p>keep these words</p></html>"))
      .toDF("u", "h").select(xxhash64($"u", $"h")).as[Long].head()
    assert(d.getAs[Long]("doc_id") == expectId)
  }

  test("writeResponses sink: per-record gzip export reads back losslessly and deterministically") {
    val dir = tmpDir()
    val pages = Seq(
      ("http://a.test/1", "<p>alpha beta</p>"),
      ("http://a.test/2", "<p>gamma delta</p>"),
      ("http://a.test/3", "<p>épsilon</p>")).toDF("url", "html")
    WarcIO.writeResponses(pages.repartition(2, $"url"), dir)
    val back = WarcIO.readResponses(spark, dir)
      .select($"target_uri", $"html").as[(String, String)].collect().sorted.toSeq
    assert(back == Seq(
      ("http://a.test/1", "<p>alpha beta</p>"),
      ("http://a.test/2", "<p>gamma delta</p>"),
      ("http://a.test/3", "<p>épsilon</p>")))
    // Deterministic bytes: re-export of the same frame is identical.
    val first = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.getName).map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
    WarcIO.writeResponses(pages.repartition(2, $"url"), dir)
    val second = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.getName).map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
    assert(first == second)
  }

  test("writeResponses overwrite: stale parts of a WIDER previous export are swept") {
    val dir = tmpDir()
    val wide = (0 until 8).map(i => (s"http://w.test/$i", s"<p>w$i</p>"))
      .toDF("url", "html")
    WarcIO.writeResponses(wide.repartition(4, $"url"), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("part-")) == 4)
    // Narrower re-export: the job-setup sweep must remove part-2/part-3
    // of the previous export, or readers would see a mixed corpus.
    val narrow = Seq(("http://n.test/1", "<p>n</p>")).toDF("url", "html")
    WarcIO.writeResponses(narrow.repartition(1), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("part-")) == 1)
    val back = WarcIO.readResponses(spark, dir)
      .select($"target_uri").as[String].collect().toSeq
    assert(back == Seq("http://n.test/1"))
  }

  test("negative Content-Length is flagged corrupt; parser resyncs on the next record") {
    val dir = tmpDir()
    writeFile(dir, "g.warc", Seq(
      record("response", "http://neg.test/", httpResponse("<p>evil</p>"),
        contentLength = Some(-1L)),
      record("response", "http://after.test/", httpResponse("<p>survives</p>"))))
    val df = WarcIO.read(spark, dir).cache()
    assert(df.filter($"_corrupt" && $"target_uri" === "http://neg.test/").count() == 1)
    val good = df.filter(!$"_corrupt" && $"warc_type" === "response").collect()
    assert(good.exists(_.getAs[String]("target_uri") == "http://after.test/"))
    df.unpersist()
  }

  test("truncated gzip tail: earlier records survive, one corrupt marker for the lost tail") {
    val dir = tmpDir()
    val full = new ByteArrayOutputStream()
    Seq(
      record("response", "http://ok.test/1", httpResponse("<p>whole record</p>")),
      record("response", "http://ok.test/2", httpResponse("<p>second whole</p>"))
    ).foreach { p =>
      val gz = new GZIPOutputStream(full) { def finishOnly(): Unit = finish() }
      gz.write(p); gz.finishOnly(); gz.flush()
    }
    val bytes = full.toByteArray
    // Chop the second member mid-stream: corrupt gzip, not clean EOF.
    val f = new FileOutputStream(s"$dir/h.warc.gz")
    try f.write(bytes, 0, bytes.length - 7) finally f.close()
    val df = WarcIO.read(spark, dir).cache()
    assert(df.filter(!$"_corrupt" && $"target_uri" === "http://ok.test/1").count() == 1)
    assert(df.filter($"_corrupt").count() == 1, "lost tail leaves a corrupt marker row")
    df.unpersist()
  }

  test("writeResponses goes through the Hadoop FileSystem (file:// URI path)") {
    val dir = tmpDir()
    val pages = Seq(("http://fs.test/x", "<p>through hadoop fs</p>")).toDF("url", "html")
    WarcIO.writeResponses(pages, s"file://$dir")
    val back = WarcIO.readResponses(spark, dir)
      .select($"target_uri", $"html").as[(String, String)].collect().toSeq
    assert(back == Seq(("http://fs.test/x", "<p>through hadoop fs</p>")))
  }

  test("non-ASCII body bytes survive the binary payload path") {
    val dir = tmpDir()
    val body = "<p>café über words</p>"
    writeFile(dir, "f.warc", Seq(
      record("response", "http://utf8.test/", httpResponse(body))))
    val got = WarcIO.readResponses(spark, dir).select($"html").as[String].head()
    assert(got == body)
  }
}
