package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode /
  * feature-extract / resize / frame-sample operators.
  *
  * ALL THREE modality paths are real, on pure-JDK codecs:
  *  - images are actual PNGs, decoded with `javax.imageio` and resized
  *    through `java.awt`;
  *  - audio payloads are actual RIFF/WAVE files (16-bit PCM mono),
  *    decoded with `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU PCM
  *    ship with every JRE);
  *  - video payloads are actual multi-frame animated GIFs, frame-read
  *    with ImageIO's GIF reader (gray ramps fit the 256-entry palette,
  *    so pixel values round-trip losslessly).
  * The deterministic byte-hash stub survives only as the corrupt-file
  * fallback — a 100 TB crawl always contains undecodable bytes and no
  * task should die over one. Everything around the kernels is the
  * production shape: per-partition batch processing (one codec init per
  * partition, not per row — the same contract a JNI/FFI decoder or a
  * Python `mapInPandas` worker needs), and size-packed partitioning so
  * a handful of 100 MB videos cannot skew one task. Compressed formats
  * beyond the JRE's registry (MP3/AAC/H.264) remain an explicit
  * dependency boundary — same signatures, add a codec, nothing else
  * moves.
  */
object Multimodal {

  /** One media row: payload + typed metadata. At 100 TB the payload
    * column dominates — keep it in its own table keyed by doc_id so
    * text-only queries never scan bytes (column pruning alone is not
    * enough when a single row group holds GBs of payloads).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  final case class MediaMeta(
      width: Option[Int], height: Option[Int], sample_rate: Option[Int],
      duration_ms: Option[Long], n_bytes: Long)
  final case class GenMedia(media_type: String, payload: Array[Byte], meta: MediaMeta)

  /** SQL-expressible image dimension rules (kept small so the encoded
    * PNGs stay a few KB): `64 + (id*7) % 128` x `64 + (id*13) % 128`.
    */
  def imageDims(id: Long): (Int, Int) =
    ((64L + math.floorMod(id * 7L, 128L)).toInt, (64L + math.floorMod(id * 13L, 128L)).toInt)

  /** Audio generation rules — every quantity SQL-expressible so the
    * decode path is oracle-checkable end-to-end:
    * `n_samples = 400 + (id*31) % 1200`, 16 kHz mono 16-bit PCM,
    * sample i = `(id*7 + i*13) % 2001 - 1000`, WAV size = 44-byte
    * canonical RIFF header + 2 bytes/sample.
    */
  val AudioRate = 16000
  def audioSamples(id: Long): Int = (400L + math.floorMod(id * 31L, 1200L)).toInt
  def audioSample(id: Long, i: Int): Int = (math.floorMod(id * 7L + i * 13L, 2001L) - 1000L).toInt

  /** Video generation rules (animated GIF): `4 + id % 5` full frames of
    * `32 + (id*5) % 64` x `24 + (id*11) % 40` gray pixels, frame f row
    * y = `(y + id + 7*f) % 256`, 100 ms/frame.
    */
  def videoFrames(id: Long): Int = (4L + math.floorMod(id, 5L)).toInt
  def videoDims(id: Long): (Int, Int) =
    ((32L + math.floorMod(id * 5L, 64L)).toInt, (24L + math.floorMod(id * 11L, 40L)).toInt)

  /** Encode 16-bit little-endian PCM mono samples as a RIFF/WAVE file
    * via the JDK writer (canonical 44-byte header for plain PCM).
    */
  private[ops] def encodeWav(samples: Array[Short], rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode via `javax.sound.sampled`: parses whatever PCM
    * container the JRE registers (WAV/AIFF/AU), normalizes to 16-bit
    * signed samples. None for undecodable bytes or non-16-bit frames.
    */
  private[ops] def decodeAudio(payload: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16 || f.getChannels != 1) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Short](n)
          var i = 0
          if (f.isBigEndian)
            while (i < n) { out(i) = (((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF))).toShort; i += 1 }
          else
            while (i < n) { out(i) = (((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF))).toShort; i += 1 }
          Some((f.getSampleRate.toInt, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Encode full-replacement gray frames as one animated GIF. A 256-gray
    * ramp fits the GIF palette exactly, so pixel values survive encode +
    * decode bit-for-bit (round-trip asserted in MultimodalSpec).
    */
  private[ops] def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL video frame decode: all frames of an animated GIF, in order.
    * None for bytes the GIF reader rejects. (Frames here are written as
    * full replacements, so per-index reads ARE the frames — a general
    * player would additionally apply disposal/compositing.)
    */
  private[ops] def decodeGifFrames(payload: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
    try {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        if (n <= 0) None else Some((0 until n).map(reader.read).toVector)
      } finally { reader.dispose(); iis.close() }
    } catch { case _: Exception => None }

  /** Deterministic synthetic media table derived from a documents table
    * — test/bench stand-in for a real ingest of binary files. Every
    * payload is a REAL file decodable by any standard reader, and every
    * decoded quantity is recomputable in SQL from the generation rules,
    * so all three decode paths are oracle-checkable end-to-end:
    *  - image: gray-gradient PNG, pixel at row y = `(y + id) % 256`;
    *  - audio: 16 kHz mono 16-bit PCM WAV, sample i =
    *    `(id*7 + i*13) % 2001 - 1000`;
    *  - video: animated GIF, frame f row y = `(y + id + 7*f) % 256`.
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val gen = udf { (id: Long) =>
      val kinds = Array("image", "audio", "video")
      val mt = kinds(math.floorMod(id, 3L).toInt)
      mt match {
        case "image" =>
          val (w, h) = imageDims(id)
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            val v = ((y + id) % 256L).toInt
            java.util.Arrays.fill(row, (v << 16) | (v << 8) | v)
            img.setRGB(0, y, w, 1, row, 0, w)
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val png = bos.toByteArray
          GenMedia(mt, png, MediaMeta(Some(w), Some(h), None, None, png.length.toLong))
        case "audio" =>
          val n = audioSamples(id)
          val samples = Array.tabulate(n)(i => audioSample(id, i).toShort)
          val wav = encodeWav(samples, AudioRate)
          GenMedia(mt, wav,
            MediaMeta(None, None, Some(AudioRate),
              Some(n.toLong * 1000L / AudioRate), wav.length.toLong))
        case _ =>
          val (w, h) = videoDims(id)
          val nf = videoFrames(id)
          val frames = (0 until nf).map { f =>
            val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              java.util.Arrays.fill(row, ((y + id + 7L * f) % 256L).toInt)
              raster.setSamples(0, y, w, 1, 0, row)
              y += 1
            }
            img
          }
          val gif = encodeGif(frames)
          GenMedia(mt, gif,
            MediaMeta(Some(w), Some(h), None, Some(nf * 100L), gif.length.toLong))
      }
    }
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .withColumn("m", gen(col("doc_id")))
      .select(col("doc_id"), col("m.media_type").as("media_type"),
        col("m.payload").as("payload"), col("m.meta").as("meta"))
  }

  val FeatureDim = 32

  /** REAL image decode via `javax.imageio` (PNG/JPEG/BMP/GIF ship with
    * the JDK): 30-bin luminance histogram (mass-normalized) + mean +
    * std, the classic cheap perceptual signature. Returns None for
    * bytes no installed reader accepts.
    */
  private[ops] def decodeImageFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Long](FeatureDim - 2)
      var sum = 0.0
      var sumSq = 0.0
      // Bulk row reads: one getRGB call per row, not per pixel (the
      // per-pixel call pays colorspace-conversion dispatch every time).
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          hist((lum * hist.length / 256.0).toInt.min(hist.length - 1)) += 1
          sum += lum
          sumSq += lum * lum
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val mean = sum / n
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < hist.length) { out(i) = (hist(i) / n).toFloat; i += 1 }
      out(FeatureDim - 2) = (mean / 255.0).toFloat
      out(FeatureDim - 1) = (math.sqrt(math.max(0.0, sumSq / n - mean * mean)) / 255.0).toFloat
      Some(out)
    }
  }

  /** Corrupt-file FALLBACK features: deterministic byte-hash signature
    * for payloads no registered codec accepts. A 100 TB crawl always
    * contains corrupt files; never kill a task over one — tag it with a
    * stable fingerprint and move on.
    */
  private[ops] def decodeToFeaturesStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      out(i) = (MurmurHash3.bytesHash(payload, i) & 0xFFFF).toFloat / 0xFFFF.toFloat
      i += 1
    }
    out
  }

  /** REAL audio features via `javax.sound.sampled`: 30-bin histogram of
    * normalized amplitude + mean + std — the audio analogue of the
    * image luminance signature.
    */
  private[ops] def decodeAudioFeatures(payload: Array[Byte]): Option[Array[Float]] =
    decodeAudio(payload).collect { case (_, samples) if samples.nonEmpty =>
      val hist = new Array[Long](FeatureDim - 2)
      var sum = 0.0
      var sumSq = 0.0
      var i = 0
      while (i < samples.length) {
        val v = (samples(i).toDouble + 32768.0) / 65536.0 // [0, 1)
        hist((v * hist.length).toInt.min(hist.length - 1)) += 1
        sum += v
        sumSq += v * v
        i += 1
      }
      val n = samples.length.toDouble
      val mean = sum / n
      val out = new Array[Float](FeatureDim)
      i = 0
      while (i < hist.length) { out(i) = (hist(i) / n).toFloat; i += 1 }
      out(FeatureDim - 2) = mean.toFloat
      out(FeatureDim - 1) = math.sqrt(math.max(0.0, sumSq / n - mean * mean)).toFloat
      Some(out)
    }.flatten

  /** REAL video features: luminance histogram pooled across all decoded
    * GIF frames + mean + std.
    */
  private[ops] def decodeVideoFeatures(payload: Array[Byte]): Option[Array[Float]] =
    decodeGifFrames(payload).map { frames =>
      val hist = new Array[Long](FeatureDim - 2)
      var sum = 0.0
      var sumSq = 0.0
      var n = 0L
      frames.foreach { img =>
        val w = img.getWidth
        val h = img.getHeight
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            hist((lum * hist.length / 256.0).toInt.min(hist.length - 1)) += 1
            sum += lum
            sumSq += lum * lum
            x += 1
          }
          y += 1
        }
        n += w.toLong * h
      }
      val mean = sum / n
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < hist.length) { out(i) = (hist(i).toDouble / n).toFloat; i += 1 }
      out(FeatureDim - 2) = (mean / 255.0).toFloat
      out(FeatureDim - 1) = (math.sqrt(math.max(0.0, sumSq / n - mean * mean)) / 255.0).toFloat
      out
    }

  /** Features for one media row: real decode per modality, byte-hash
    * fallback for undecodable payloads.
    */
  private[ops] def featuresOf(mediaType: String, payload: Array[Byte]): Array[Float] =
    (mediaType match {
      case "image" => decodeImageFeatures(payload)
      case "audio" => decodeAudioFeatures(payload)
      case "video" => decodeVideoFeatures(payload)
      case _       => None
    }).getOrElse(decodeToFeaturesStub(payload))

  /** REAL resize for images: ImageIO decode -> `java.awt` bilinear
    * scale -> PNG re-encode. Undecodable bytes pass through unchanged.
    */
  private[ops] def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) payload
    else {
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL frame sampler: decodes the animated-GIF payload, picks `n`
    * evenly spaced frames (frame j = floor(j * nFrames / n), the
    * standard uniform temporal sample; repeats when n > nFrames), and
    * re-encodes each as a standalone PNG. Byte-slice fallback for
    * undecodable payloads keeps the row count contract (`n` rows per
    * video) under corruption.
    */
  private[ops] def frameSample(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
    decodeGifFrames(payload) match {
      case Some(frames) =>
        (0 until n).map { j =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(frames((j.toLong * frames.length / n).toInt), "png", bos)
          bos.toByteArray
        }
      case None =>
        val step = math.max(1, payload.length / math.max(1, n))
        (0 until n).map { i =>
          val from = math.min(payload.length - 1, i * step)
          java.util.Arrays.copyOfRange(payload, from, math.min(payload.length, from + step))
        }
    }

  /** Batch feature extraction: (doc_id, media_type, features). Runs
    * per-partition (mapPartitions), the shape under which a real codec
    * initializes once per task and processes a batch — mirroring the
    * `mapInPandas` batch contract, JVM-side.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select($"doc_id".cast("long"), $"media_type", $"payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // (heavier codecs: initialize decoder context here, once per task)
        it.map { case (id, mt, payload) => (id, mt, featuresOf(mt, payload)) }
      }
      .toDF("doc_id", "media_type", "features")
  }

  /** Decoded-pixel statistics for image rows — the oracle-checkable
    * decode surface: (doc_id, width_px, height_px, px_sum) all come
    * from `ImageIO.read` of the actual payload, and for
    * [[syntheticMedia]]'s gradient PNGs an external engine recomputes
    * them from the generation rules (px_sum = w * sum_y (y+id)%256,
    * exact integers — no FP in the compared cells).
    */
  def imagePixelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter($"media_type" === "image")
      .select($"doc_id".cast("long"), $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          if (img == null) Iterator.empty
          else {
            val w = img.getWidth
            val h = img.getHeight
            var s = 0L
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) { s += row(x) & 0xFF; x += 1 }
              y += 1
            }
            Iterator((id, w.toLong, h.toLong, s))
          }
        }
      }
      .toDF("doc_id", "width_px", "height_px", "px_sum")
  }

  /** Comparison-friendly shape of the decode pipeline: scalar derived
    * columns only — a raw `array<float>` column breaks columnar
    * comparison harnesses (pandas cannot sort ndarray cells). Same
    * batch-per-partition decode as [[extractFeatures]]; the vector is
    * reduced in-task to an L2 norm and an FNV-1a hash of its bits, so
    * any change to the decode kernel still flips the output.
    */
  def extractFeatureStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select($"doc_id".cast("long"), $"media_type", $"payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // (heavier codecs: initialize decoder context here, once per task)
        it.map { case (id, mt, payload) =>
          val f = featuresOf(mt, payload)
          var norm = 0.0
          var h = -3750763034362895579L // FNV-1a 64-bit offset basis
          var i = 0
          while (i < f.length) {
            norm += f(i).toDouble * f(i)
            h = (h ^ java.lang.Float.floatToIntBits(f(i))) * 1099511628211L
            i += 1
          }
          (id, mt, payload.length.toLong, math.rint(math.sqrt(norm) * 1e4) / 1e4, h)
        }
      }
      .toDF("doc_id", "media_type", "n_bytes", "feature_norm", "features_hash")
  }

  /** Scalar metadata projection of a media table: the oracle-checkable
    * surface (types follow doc_id mod 3; dims/durations follow the
    * generation rules; n_bytes is SQL-derivable only for audio — a
    * canonical PCM WAV is exactly `44 + 2*n_samples` bytes — and is
    * projected NULL for image/video, whose PNG/GIF sizes are the
    * encoder's business). Ints cast to long so dtypes line up with an
    * external engine's BIGINT arithmetic.
    */
  def mediaSummary(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      col("meta.width").cast("long").as("width"),
      col("meta.height").cast("long").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      when(col("media_type") === "audio", col("meta.n_bytes"))
        .otherwise(lit(null).cast("long")).as("n_bytes"))

  /** Resize pass for image rows (real decode -> scale -> re-encode);
    * non-image rows pass through unchanged.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val rs = udf((p: Array[Byte]) => resizeImage(p, w, h))
    media.withColumn("payload",
      when(col("media_type") === "image", rs(col("payload"))).otherwise(col("payload")))
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * (real GIF decode -> PNG per frame).
    */
  def sampleFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    val fs = udf((p: Array[Byte]) => frameSample(p, framesPerVideo))
    media
      .filter(col("media_type") === "video")
      .select(col("doc_id"), posexplode(fs(col("payload"))).as(Seq("frame_idx", "frame")))
  }

  /** Decoded-sample statistics for audio rows — the oracle-checkable
    * decode surface: sample_rate/n_samples/sample_sum all come from
    * `AudioSystem` parsing the actual WAV bytes, and for
    * [[syntheticMedia]]'s PCM payloads an external engine recomputes
    * them from the generation rules (exact integers — no FP in the
    * compared cells).
    */
  def audioSampleStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter($"media_type" === "audio")
      .select($"doc_id".cast("long"), $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeAudio(payload).map { case (rate, samples) =>
            var s = 0L
            var i = 0
            while (i < samples.length) { s += samples(i); i += 1 }
            (id, rate.toLong, samples.length.toLong, s)
          }
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "sample_sum")
  }

  /** Decoded per-frame pixel statistics for video rows — the
    * oracle-checkable frame-decode surface: one row per GIF frame with
    * exact-integer pixel sums an external engine recomputes from the
    * generation rules.
    */
  def videoFrameStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter($"media_type" === "video")
      .select($"doc_id".cast("long"), $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeGifFrames(payload).toSeq.flatMap { frames =>
            frames.iterator.zipWithIndex.map { case (img, f) =>
              val w = img.getWidth
              val h = img.getHeight
              var s = 0L
              val row = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, row, 0, w)
                var x = 0
                while (x < w) { s += row(x) & 0xFF; x += 1 }
                y += 1
              }
              (id, f.toLong, w.toLong, h.toLong, s)
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "width_px", "height_px", "px_sum")
  }

  /** Size-packed repartitioning: spread payload bytes evenly so decode
    * tasks are balanced (a plain hash partition lets a few huge videos
    * serialize one task at 100 TB). Rows are range-sorted by descending
    * `meta.n_bytes` (distributed sort), given contiguous global ranks
    * (`zipWithIndex`, one extra pass), and dealt round-robin
    * `rank % parts` — so the k largest rows land in k DISTINCT
    * partitions for any k <= parts, and per-partition byte totals
    * differ by at most one stripe. `targetBytes` ~ executor-comfortable
    * batch size.
    */
  def balanceBySize(media: DataFrame, targetBytes: Long = 64L << 20): DataFrame = {
    val spark = media.sparkSession
    // sum() over zero rows is NULL — coalesce before getLong.
    val total = media.select(coalesce(sum(col("meta.n_bytes")), lit(0L))).head().getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    val schema = media.schema
    val byteIdx = schema.fieldIndex("meta")
    val balanced = media.rdd
      .map(r => (r.getStruct(byteIdx).getAs[Long]("n_bytes"), r))
      .sortByKey(ascending = false, numPartitions = parts)
      .zipWithIndex()
      .map { case ((_, r), rank) => (rank % parts, r) }
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = parts
        def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
      })
      .values
    spark.createDataFrame(balanced, schema)
  }
}
