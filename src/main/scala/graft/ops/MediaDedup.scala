package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal deduplication: find duplicate media by DECODED CONTENT,
  * not container bytes. Byte-level hashing (the `q_dedup_exact`
  * discipline) misses the dominant real-world duplicate class — the
  * same image re-encoded (PNG↔BMP↔JPEG, different compressor levels,
  * stripped metadata) — because every re-encode changes the bytes.
  * Decoding first and hashing the pixel raster catches exactly that
  * class; a perceptual dHash on top catches *near*-duplicates
  * (brightness shifts, slight crops) via the Hamming-ball machinery
  * shared with [[Dedup.hammingNearDuplicates]].
  *
  * The reference engine has no media surface (`/root/reference/
  * README.md` — scalar streams only); this completes the multimodal
  * layer of [[Multimodal]] with the dedup stage a crawl pipeline runs
  * after decode.
  *
  * Scale shape: decode is per-row executor work over the size-balanced
  * media partitions ([[Multimodal.balanceBySize]]); signatures are 8
  * bytes/row; exact-dup grouping is ONE hash shuffle on the signature
  * with a min-id aggregate (no `collect_list` of ids, so a
  * million-copy duplicate class cannot blow an executor); near-dup is
  * the capped 4×16-bit segment bucket join. Nothing quadratic,
  * nothing driver-side.
  */
object MediaDedup {

  /** FNV-1a 64 over (width, height, row-major ARGB ints) of the
    * DECODED raster — a canonical content identity independent of the
    * container format. None when no installed reader accepts the
    * bytes (corrupt payloads form their own per-byte-hash identity
    * downstream rather than colliding on a sentinel).
    */
  private[graft] def pixelHash(img: java.awt.image.BufferedImage): Long = {
    val Prime = 0x100000001b3L
    var h = 0xcbf29ce484222325L
    def mix(v: Int): Unit = {
      var i = 0
      var x = v
      while (i < 4) { h = (h ^ (x & 0xFF)) * Prime; x >>>= 8; i += 1 }
    }
    mix(img.getWidth); mix(img.getHeight)
    val w = img.getWidth
    val row = new Array[Int](w)
    var y = 0
    while (y < img.getHeight) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) { mix(row(x)); x += 1 }
      y += 1
    }
    h
  }

  private[graft] def decodePixelHash(payload: Array[Byte]): Option[Long] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .map(pixelHash)
    } catch { case _: Exception => None }

  /** Perceptual difference hash (dHash, Krawetz 2013): area-average
    * the decoded image to a 9×8 luminance grid with exact integer
    * arithmetic (no platform-dependent scaler), then emit one bit per
    * horizontal neighbor comparison — 64 bits whose Hamming distance
    * tracks visual similarity. Deterministic across JVMs: integer
    * sums, integer division, ITU-R 601 luma weights.
    */
  private[graft] def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val lum = Array.ofDim[Long](gh, gw)
    val cnt = Array.ofDim[Long](gh, gw)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val gy = (y.toLong * gh / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * gw / w).toInt
        val p = row(x)
        val l = ((p >> 16 & 0xFF) * 299L + (p >> 8 & 0xFF) * 587L + (p & 0xFF) * 114L) / 1000L
        lum(gy)(gx) += l
        cnt(gy)(gx) += 1L
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        val a = lum(gy)(gx) / math.max(cnt(gy)(gx), 1L)
        val b = lum(gy)(gx + 1) / math.max(cnt(gy)(gx + 1), 1L)
        if (a > b) bits |= 1L << (gy * (gw - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  private[graft] def decodeDHash(payload: Array[Byte]): Option[Long] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .map(dHash)
    } catch { case _: Exception => None }

  private[graft] def reencodeImage(payload: Array[Byte], format: String): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Container-format normalization: decode each image payload and
    * re-encode it as `format` (any JDK ImageIO writer: png/bmp/jpg/
    * gif). Per-row executor work, no shuffle; undecodable payloads
    * pass through unchanged (flagging them is [[pixelSignatures]]'
    * job). The pixel raster — and therefore [[pixelSignatures]] — is
    * preserved for lossless formats.
    */
  def transcodeImages(
      media: DataFrame, format: String,
      payloadCol: String = "payload"): DataFrame = {
    val t = udf((p: Array[Byte]) =>
      try reencodeImage(p, format) catch { case _: Exception => p })
    media.withColumn(payloadCol, t(col(payloadCol)))
  }

  /** Decoded-content hash for AUDIO: FNV-1a over (rate, PCM samples).
    * Catches byte-different payloads with identical sound — extra
    * header chunks, container re-muxes — exactly as the pixel hash
    * does for re-encoded images. None when undecodable. */
  private[graft] def audioContentHash(payload: Array[Byte]): Option[Long] =
    Multimodal.decodeAudio(payload).map { case (rate, samples) =>
      val Prime = 0x100000001b3L
      var h = 0xcbf29ce484222325L
      def mix(v: Int): Unit = {
        var i = 0; var x = v
        while (i < 4) { h = (h ^ (x & 0xFF)) * Prime; x >>>= 8; i += 1 }
      }
      mix(rate); mix(samples.length)
      var i = 0
      while (i < samples.length) { mix(samples(i).toInt); i += 1 }
      h
    }

  /** Decoded-content hash for VIDEO: FNV-1a over the per-frame pixel
    * hashes — trailing bytes after the GIF trailer, re-muxed
    * containers with identical frames, etc. hash equal. */
  private[graft] def videoContentHash(payload: Array[Byte]): Option[Long] =
    Multimodal.decodeGifFrames(payload).map { frames =>
      val Prime = 0x100000001b3L
      var h = 0xcbf29ce484222325L
      frames.foreach { f =>
        var x = pixelHash(f)
        var i = 0
        while (i < 8) { h = (h ^ (x & 0xFF)) * Prime; x >>>= 8; i += 1 }
      }
      h
    }

  /** Insert a benign LIST/INFO chunk between a canonical 44-byte-header
    * WAV's fmt and data chunks — byte-different, sound-identical (the
    * container-remux duplicate class the content hash must catch).
    * Requires the canonical layout ([[Multimodal]]'s encoder and most
    * simple writers); anything else passes through unchanged.
    */
  private[graft] def padWavChunk(payload: Array[Byte]): Array[Byte] = {
    def tag(off: Int, t: String) =
      payload.length >= off + 4 && new String(payload, off, 4, "US-ASCII") == t
    if (!(tag(0, "RIFF") && tag(8, "WAVE") && tag(12, "fmt ") && tag(36, "data")))
      payload
    else {
      val out = new Array[Byte](payload.length + 12)
      System.arraycopy(payload, 0, out, 0, 36)
      System.arraycopy("LIST".getBytes("US-ASCII"), 0, out, 36, 4)
      out(40) = 4; out(41) = 0; out(42) = 0; out(43) = 0
      System.arraycopy("INFO".getBytes("US-ASCII"), 0, out, 44, 4)
      System.arraycopy(payload, 36, out, 48, payload.length - 36)
      // RIFF size field (LE at offset 4) grows by the 12 chunk bytes
      val sz = (payload(4) & 0xFF) | (payload(5) & 0xFF) << 8 |
        (payload(6) & 0xFF) << 16 | (payload(7) & 0xFF) << 24
      val ns = sz + 12
      out(4) = (ns & 0xFF).toByte; out(5) = (ns >> 8 & 0xFF).toByte
      out(6) = (ns >> 16 & 0xFF).toByte; out(7) = (ns >> 24 & 0xFF).toByte
      out
    }
  }

  /** (doc_id, media_type, sig): decoded-content signature for ANY
    * modality — images by raster, audio by PCM samples, video by
    * frame rasters. Undecodable payloads drop (they cannot have
    * content-identical twins).
    *
    * Decode-once shape: the drop is `explode` of a 0/1-element UDF
    * result, NOT a `where(sig.isNotNull)` over a projected UDF — the
    * optimizer substitutes a projected alias into a pushed-down filter,
    * which runs the decode TWICE per row (once in the filter, once in
    * the project); a Generate evaluates its generator exactly once.
    */
  def contentSignatures(
      media: DataFrame,
      idCol: String = "doc_id", typeCol: String = "media_type",
      payloadCol: String = "payload"): DataFrame = {
    val sigOf = udf((t: String, p: Array[Byte]) => (t match {
      case "image" => decodePixelHash(p)
      case "audio" => audioContentHash(p)
      case "video" => videoContentHash(p)
      case _ => None
    }).toSeq)
    media
      .select(col(idCol).cast("long").as("doc_id"),
        col(typeCol).as("media_type"),
        explode(sigOf(col(typeCol), col(payloadCol))).as("sig"))
  }

  /** [[exactPixelDuplicatePairs]] across ALL modalities: (a, b) pairs
    * grouped by (media_type, signature) — hash spaces never collide
    * across modalities by construction of the key. */
  def exactContentDuplicatePairs(
      media: DataFrame,
      idCol: String = "doc_id", typeCol: String = "media_type",
      payloadCol: String = "payload"): DataFrame = {
    // Decode ONCE into an eagerly localCheckpoint'ed signature frame
    // (eager: a lazy checkpoint lets the join's two independent stages
    // race and each decode the corpus before the other's blocks land)
    // (24-byte rows — cheap to hold even at corpus scale next to the
    // payloads), then a map-side-combinable min/count aggregation on
    // the signature joined back onto the occurrences. A viral image
    // duplicated 10^6 times collapses to one agg row per map task
    // before the exchange, and the hot join probe is AQE
    // skew-splittable — unlike the `Window.partitionBy(sig)` this
    // replaces, which serialized every occurrence onto ONE
    // un-splittable WindowExec sort.
    val sigs = contentSignatures(media, idCol, typeCol, payloadCol)
      .localCheckpoint()
    val agg = sigs.groupBy(col("media_type"), col("sig"))
      .agg(min(col("doc_id")).as("a"), count(lit(1)).as("n"))
      .where(col("n") >= 2)
    sigs.join(agg, Seq("media_type", "sig"))
      .where(col("doc_id") =!= col("a"))
      .select(col("media_type"), col("a"), col("doc_id").as("b"))
  }

  /** (doc_id, sig): decoded-pixel content signature per image row.
    * Rows whose payload no reader accepts are dropped (they cannot
    * have pixel-identical twins). */
  def pixelSignatures(
      media: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    // explode-of-Option drop, not project + isNotNull filter — see
    // [[contentSignatures]]: the filter shape decodes twice per row.
    val sigOf = udf((p: Array[Byte]) => decodePixelHash(p).toSeq)
    media
      .select(col(idCol).cast("long").as("doc_id"),
        explode(sigOf(col(payloadCol))).as("sig"))
  }

  /** Exact decoded-content duplicate pairs (a, b), a = the group's
    * smallest id, one row per other member — so a k-copy class emits
    * k−1 rows, linear, and a pathological million-copy class needs no
    * per-key array. One shuffle on the 8-byte signature.
    */
  def exactPixelDuplicatePairs(
      media: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    // Same decode-once checkpoint + skew-immune agg + join-back shape
    // as [[exactContentDuplicatePairs]].
    val sigs = pixelSignatures(media, idCol, payloadCol)
      .localCheckpoint()
    val agg = sigs.groupBy(col("sig"))
      .agg(min(col("doc_id")).as("a"), count(lit(1)).as("n"))
      .where(col("n") >= 2)
    sigs.join(agg, Seq("sig"))
      .where(col("doc_id") =!= col("a"))
      .select(col("a"), col("doc_id").as("b"))
  }

  /** Perceptual near-duplicate pairs (doc_a, doc_b, dist): dHash
    * fingerprints through the shared capped Hamming segment join. */
  def nearDuplicatePairs(
      media: DataFrame, maxDist: Int = 3, maxBucket: Int = 256,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    // explode-of-Option drop — the project + isNotNull filter shape
    // would decode twice per row (see [[contentSignatures]]).
    val fpOf = udf((p: Array[Byte]) => decodeDHash(p).toSeq)
    val fps = media
      .select(col(idCol).cast("long").as("doc_id"),
        explode(fpOf(col(payloadCol))).as("fp"))
    Dedup.hammingNearDuplicates(fps, maxDist, maxBucket)
  }
}
