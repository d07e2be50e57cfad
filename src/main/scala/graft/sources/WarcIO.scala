package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, GZIPInputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) crawl-archive source — the step before
  * [[graft.ops.HtmlExtract]] in a real pretraining pipeline: Common
  * Crawl and every in-house crawler deliver WARC, not JSONL. The
  * reference has no sources at all (`/root/reference/core/stream.go:104`
  * — `Append` is the only ingest); this exists for the pipeline's
  * users.
  *
  * Scale shape: WARC files are NOT block-splittable — production
  * archives are concatenated per-record gzip members, and a reader
  * cannot seek to a member boundary inside a block — so the unit of
  * parallelism is the FILE (the crawl convention: ~1 GB per file,
  * thousands of files). `binaryFiles` gives one `PortableDataStream`
  * per file per task; each record is parsed streaming with a hard
  * `maxRecordBytes` cap, so executor memory is bounded by the largest
  * admitted record, never the file. Java's `GZIPInputStream` reads
  * concatenated members transparently, which is exactly the
  * per-record-gzip layout.
  *
  * Corrupt-record discipline matches [[CorpusIO]]: a malformed record
  * (bad header, missing Content-Length, oversize) is emitted with
  * `_corrupt = true` and whatever fields parsed, and the parser
  * resyncs on the next `WARC/` magic — one bad record never loses the
  * rest of the file.
  */
object WarcIO {

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType),
    StructField("_corrupt", BooleanType)))

  /** One parsed record; `payload` is the HTTP BODY for response
    * records (headers consumed), the raw block otherwise.
    */
  final case class WarcRecord(
      warcFile: String,
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      httpStatus: Option[Int],
      httpContentType: String,
      payload: Array[Byte],
      corrupt: Boolean)

  /** Read every record of every WARC file under `path` (gzip members
    * handled transparently). One task per file — the WARC scale unit.
    */
  def read(
      spark: SparkSession,
      path: String,
      maxRecordBytes: Int = 64 * 1024 * 1024): DataFrame = {
    val cap = maxRecordBytes
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open())
        val in =
          if (isGzip(raw)) new DataInputStream(new BufferedInputStream(new GZIPInputStream(raw)))
          else new DataInputStream(raw)
        recordIterator(file, in, cap)
      }
      .map(r => Row(r.warcFile, r.warcType, r.recordId, r.targetUri, r.warcDate,
        r.httpStatus.map(Integer.valueOf).orNull, r.httpContentType, r.payload, r.corrupt))
    spark.createDataFrame(rows, schema)
  }

  /** `response` records only, body decoded as UTF-8 text (the HTML
    * path): (warc_file, target_uri, warc_date, http_status, html).
    */
  def readResponses(
      spark: SparkSession,
      path: String,
      maxRecordBytes: Int = 64 * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, path, maxRecordBytes)
      .filter(col("warc_type") === "response" && !col("_corrupt"))
      .select(col("warc_file"), col("target_uri"), col("warc_date"),
        col("http_status"),
        decode(col("payload"), "UTF-8").as("html"))
  }

  /** The full crawl-ingestion composition: WARC responses → HTML
    * boilerplate extraction → (doc_id, url, fetch_date, text) ready
    * for [[graft.ops.Curation]]. `doc_id` is the content hash
    * ([[CorpusIO]]'s discipline: deterministic, identical fetches
    * collapse).
    */
  def toDocuments(
      spark: SparkSession,
      path: String,
      minWordsPerLine: Int = 1,
      maxRecordBytes: Int = 64 * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions._
    readResponses(spark, path, maxRecordBytes)
      .filter(col("http_status") === 200)
      .select(
        xxhash64(col("target_uri"), col("html")).as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetch_date"),
        graft.ops.HtmlExtract.extractText(col("html"), minWordsPerLine).as("text"))
  }

  /** WARC sink: write each row as one `response` record (status 200,
    * text/html), one file per partition under `outDir`
    * (`part-<p>.warc.gz`, per-record gzip members — the crawl-archive
    * layout [[read]] consumes). The export side of the crawl story:
    * ship a curated corpus back out in the format crawl tooling
    * expects. Deterministic bytes for deterministic input partitions
    * (fixed date, record id = content hash), so a re-export of the
    * same frame is byte-identical. Existing `part-*.warc.gz` files in
    * `outDir` are overwritten.
    *
    * The export holds the [[WriterLock]] on `outDir` for its duration:
    * the setup sweep below deletes every previous `part-*.warc.gz`, so
    * two concurrent exports into one directory would destroy each
    * other's already-committed parts (the rename-first task protocol
    * only protects within one job). A second exporter fails loudly.
    */
  def writeResponses(
      df: DataFrame,
      outDir: String,
      urlCol: String = "url",
      htmlCol: String = "html"): Unit = {
    val urlC = urlCol; val htmlC = htmlCol
    // Cluster-real output: all paths go through the Hadoop FileSystem
    // for `outDir`'s scheme (HDFS/S3A/local alike), never java.io —
    // a task writing java.io.File lands on the EXECUTOR's local disk.
    val hconf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(outDir)
    val dirFs = dirPath.getFileSystem(hconf.value)
    dirFs.mkdirs(dirPath)
    WriterLock.withLock(dirFs, WriterLock.lockPath(outDir), s"WARC export $outDir") {
    // Job setup (driver, before any task runs): sweep temp leftovers of
    // previously failed/killed jobs AND the previous export's part
    // files. Overwrite therefore happens HERE, exactly once — tasks
    // rename-first and never delete a part file, so a task-level retry
    // or speculative attempt can never destroy a part this job already
    // committed (a delete inside the task commit left a window where a
    // killed attempt lost the partition silently).
    val stale = dirFs.globStatus(
      new org.apache.hadoop.fs.Path(dirPath, "{_tmp-part-*,part-*}.warc.gz"))
    if (stale != null) stale.foreach(st => dirFs.delete(st.getPath, false))
    df.select(org.apache.spark.sql.functions.col(urlC).cast("string"),
        org.apache.spark.sql.functions.col(htmlC).cast("string"))
      .foreachPartition { (it: Iterator[Row]) =>
        // Task-commit protocol: write to a per-ATTEMPT temp path and
        // rename into place only on success — a speculative or retried
        // attempt writing the final path directly would interleave two
        // gzip streams into one corrupt file, and a failed task would
        // leave a partial file that reads as complete. Rename is
        // atomic on HDFS/local; if a concurrent attempt won the rename
        // race the loser just discards its temp file — partition bytes
        // are deterministic, so both attempts' outputs are identical.
        val ctx = org.apache.spark.TaskContext.get()
        val pid = ctx.partitionId()
        val tmp = new org.apache.hadoop.fs.Path(outDir,
          s"_tmp-part-$pid-attempt-${ctx.taskAttemptId()}.warc.gz")
        val part = new org.apache.hadoop.fs.Path(outDir, s"part-$pid.warc.gz")
        val fs = part.getFileSystem(hconf.value)
        var ok = false
        val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
        // ONE Deflater per partition, reset per member, end()ed in
        // finally — a GZIPOutputStream per record leaks one native
        // Deflater per record (finish() does not release it).
        val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
        val crc = new CRC32()
        val buf = new Array[Byte](1 << 16)
        try { it.foreach { row =>
          val url = row.getString(0); val html = row.getString(1)
          if (url != null && html != null) {
            val body = html.getBytes(StandardCharsets.UTF_8)
            val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII)
            val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:hash:${java.lang.Long.toHexString(url.hashCode.toLong)}>\r\n" +
              s"WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: $url\r\n" +
              s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8)
            val member = new java.io.ByteArrayOutputStream(
              head.length + http.length + body.length + 4)
            member.write(head); member.write(http); member.write(body)
            member.write('\r'); member.write('\n'); member.write('\r'); member.write('\n')
            writeGzipMember(out, defl, crc, buf, member.toByteArray)
          }
        }
          ok = true
        } finally {
          defl.end()
          out.close()
          if (ok) {
            // Rename FIRST, never delete a committed part: a
            // delete-then-rename window would let a killed attempt
            // leave NO final file while the job reports success. Rename
            // refuses when the destination exists (local/HDFS), so a
            // failure with the part present means a concurrent
            // identical attempt already committed — partition bytes are
            // deterministic, discard ours. A failure with NO part in
            // place is a real filesystem error: surface it (the retry
            // or speculation machinery re-runs the task) instead of
            // silently losing the partition.
            if (!fs.rename(tmp, part)) {
              if (fs.exists(part)) fs.delete(tmp, false)
              else throw new java.io.IOException(
                s"WARC commit: could not install $tmp as $part and no committed part exists")
            }
          } else fs.delete(tmp, false)
        }
      }
    }
  }

  /** Hadoop `Configuration` is Writable, not Serializable; this is the
    * standard closure-capture wrapper (write/readFields round trip).
    */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Fixed 10-byte gzip member header (RFC 1952): deflate, no flags,
    * MTIME pinned to 0 so exports are byte-deterministic, OS unknown.
    */
  private val GzipMemberHeader = Array[Byte](
    0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)

  /** Write `data` as one complete gzip member, reusing the caller's
    * Deflater (raw/nowrap mode) and CRC32 across members.
    */
  private def writeGzipMember(
      out: OutputStream, defl: Deflater, crc: CRC32,
      buf: Array[Byte], data: Array[Byte]): Unit = {
    out.write(GzipMemberHeader)
    defl.reset(); defl.setInput(data); defl.finish()
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    crc.reset(); crc.update(data)
    writeIntLE(out, crc.getValue.toInt)
    writeIntLE(out, data.length) // ISIZE mod 2^32
  }

  private def writeIntLE(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  // ------------------------------------------------------------ parser

  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    b0 == 0x1f && b1 == 0x8b
  }

  /** Streaming record iterator: reads headers line-wise, the block by
    * its declared Content-Length, and resyncs on `WARC/` after any
    * malformed record. Never holds more than one record.
    */
  private def recordIterator(
      file: String,
      in: DataInputStream,
      cap: Int): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var nextRec: WarcRecord = _
    private var done = false
    advance()

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; advance(); r
    }

    private def advance(): Unit = {
      nextRec = null
      while (nextRec == null && !done) {
        try {
          val version = skipToVersionLine()
          if (version == null) { done = true; in.close() }
          else nextRec = parseOne(version)
        } catch {
          case _: java.io.IOException =>
            // A clean end never throws (readLine returns null at EOF),
            // so ANY IOException here — EOFException from a truncated
            // record body, ZipException/"unexpected end of ZLIB" from
            // a corrupt or chopped gzip tail — means data was lost and
            // the stream cannot advance (a retry would throw at the
            // same position). Close out the file: records already
            // emitted survive, and one corrupt marker row records that
            // the tail was lost.
            done = true
            try in.close() catch { case _: java.io.IOException => () }
            nextRec = WarcRecord(file, "", "", "", "", None, "",
              Array.emptyByteArray, corrupt = true)
        }
      }
    }

    /** Read lines until a `WARC/x.y` line (resync) or EOF (null). */
    private def skipToVersionLine(): String = {
      var line = readLine(in)
      while (line != null && !line.startsWith("WARC/")) line = readLine(in)
      line
    }

    private def parseOne(version: String): WarcRecord = {
      val headers = collection.mutable.Map.empty[String, String]
      var line = readLine(in)
      while (line != null && line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) headers(line.substring(0, i).trim.toLowerCase) = line.substring(i + 1).trim
        line = readLine(in)
      }
      val wtype = headers.getOrElse("warc-type", "")
      val uri = headers.getOrElse("warc-target-uri", "")
      val date = headers.getOrElse("warc-date", "")
      val rid = headers.getOrElse("warc-record-id", "")
      val lenOpt = headers.get("content-length").flatMap(s => s.toLongOption)
      lenOpt match {
        case None =>
          WarcRecord(file, wtype, rid, uri, date, None, "", Array.emptyByteArray, corrupt = true)
        case Some(len) if len < 0 =>
          // A hostile "Content-Length: -1" must not reach the array
          // allocation below — flag it and resync like the other
          // malformed-header cases.
          WarcRecord(file, wtype, rid, uri, date, None, "", Array.emptyByteArray, corrupt = true)
        case Some(len) if len > cap =>
          // Oversize: skip the block (bounded memory), flag the record.
          skipFully(in, len)
          WarcRecord(file, wtype, rid, uri, date, None, "", Array.emptyByteArray, corrupt = true)
        case Some(len) =>
          val block = new Array[Byte](len.toInt)
          in.readFully(block)
          if (wtype == "response") parseHttp(file, rid, uri, date, block)
          else WarcRecord(file, wtype, rid, uri, date, None,
            headers.getOrElse("content-type", ""), block, corrupt = false)
      }
    }

    private def parseHttp(
        file: String, rid: String, uri: String, date: String,
        block: Array[Byte]): WarcRecord = {
      val sep = indexOfCrlfCrlf(block)
      if (sep < 0)
        return WarcRecord(file, "response", rid, uri, date, None, "", block, corrupt = true)
      val head = new String(block, 0, sep, StandardCharsets.US_ASCII)
      val lines = head.split("\r\n")
      val status = lines.headOption
        .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption)
      val ctype = lines.iterator.drop(1)
        .map(_.split(":", 2)).collectFirst {
          case Array(k, v) if k.trim.equalsIgnoreCase("content-type") => v.trim
        }.getOrElse("")
      val body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
      WarcRecord(file, "response", rid, uri, date, status, ctype, body,
        corrupt = status.isEmpty)
    }
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) { if (in.read() < 0) throw new EOFException; left -= 1 }
      else left -= s
    }
  }

  /** Read one CRLF (or bare-LF) terminated ASCII line; null at EOF
    * before any byte. Header lines only — bodies go through readFully.
    */
  private def readLine(in: DataInputStream): String = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }
}
