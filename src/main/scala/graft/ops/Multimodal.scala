package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The IMAGE path is real: payloads are actual PNGs, decoded with
  * `javax.imageio` and resized through `java.awt` — no codec stubs.
  * Audio/video decode kernels remain documented deterministic stand-ins
  * (no audio/video codec ships with the JDK). Everything around them is
  * the production shape: schema, per-partition batch processing (one
  * codec init per partition, not per row — the same contract a JNI/FFI
  * decoder or a Python `mapInPandas` worker needs), and size-packed
  * partitioning so a handful of 100 MB videos cannot skew one task.
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

  /** Payload size rule for the (stubbed) audio/video payloads:
    * SQL-expressible on purpose (Knuth multiplicative hash, mod range)
    * so those sizes can be oracled by an external engine:
    * `256 + (doc_id * 2654435761) % 768`. Image payloads are REAL PNGs
    * whose byte size is whatever the encoder produces.
    */
  def payloadBytes(id: Long): Long = 256L + math.floorMod(id * 2654435761L, 768L)

  /** SQL-expressible image dimension rules (kept small so the encoded
    * PNGs stay a few KB): `64 + (id*7) % 128` x `64 + (id*13) % 128`.
    */
  def imageDims(id: Long): (Int, Int) =
    ((64L + math.floorMod(id * 7L, 128L)).toInt, (64L + math.floorMod(id * 13L, 128L)).toInt)

  /** Deterministic synthetic media table derived from a documents table
    * — test/bench stand-in for a real ingest of binary files. Image rows
    * carry a REAL gray-gradient PNG whose pixel value at row y is
    * `(y + id) % 256` on every channel — decodable by any PNG reader and
    * recomputable in SQL, so the decode path is oracle-checkable
    * end-to-end. Audio/video payloads stay opaque deterministic bytes.
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val gen = udf { (id: Long) =>
      val rnd = new scala.util.Random(id * 0x9E3779B9L)
      val kinds = Array("image", "audio", "video")
      val mt = kinds(math.floorMod(id, 3L).toInt)
      mt match {
        case "image" =>
          val (w, h) = imageDims(id)
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val v = ((y + id) % 256L).toInt
            val px = (v << 16) | (v << 8) | v
            var x = 0
            while (x < w) { img.setRGB(x, y, px); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val png = bos.toByteArray
          GenMedia(mt, png, MediaMeta(Some(w), Some(h), None, None, png.length.toLong))
        case "audio" =>
          val n = payloadBytes(id).toInt
          val bytes = new Array[Byte](n)
          rnd.nextBytes(bytes)
          GenMedia(mt, bytes,
            MediaMeta(None, None, Some(16000), Some(1000L + math.floorMod(id * 31L, 60000L)), n.toLong))
        case _ =>
          val n = payloadBytes(id).toInt
          val bytes = new Array[Byte](n)
          rnd.nextBytes(bytes)
          GenMedia(mt, bytes,
            MediaMeta(Some(320), Some(240), None, Some(1000L + math.floorMod(id * 17L, 120000L)), n.toLong))
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
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
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

  /** STUB decoder for audio/video payloads (no codec in the JDK).
    * Deterministic function of the payload bytes so tests are stable. A
    * real build replaces ONLY this function (same signature — bytes in,
    * fixed-dim features out); the Spark plumbing around it is unchanged.
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

  /** Features for one media row: real decode for images, stub for
    * audio/video (falls back to the stub if image bytes are undecodable
    * — a 100 TB crawl always contains corrupt files; never kill a task
    * over one).
    */
  private[ops] def featuresOf(mediaType: String, payload: Array[Byte]): Array[Float] =
    if (mediaType == "image") decodeImageFeatures(payload).getOrElse(decodeToFeaturesStub(payload))
    else decodeToFeaturesStub(payload)

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

  /** STUB frame sampler: yields `n` deterministic "frames" (byte
    * slices) of a video payload.
    */
  private[ops] def frameSampleStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
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
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { s += img.getRGB(x, y) & 0xFF; x += 1 }
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
    * generation rules; n_bytes follows [[payloadBytes]] for audio/video
    * and is projected NULL for images, whose real PNG size is not
    * SQL-derivable). Ints cast to long so dtypes line up with an
    * external engine's BIGINT arithmetic.
    */
  def mediaSummary(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      col("meta.width").cast("long").as("width"),
      col("meta.height").cast("long").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      when(col("media_type") === "image", lit(null).cast("long"))
        .otherwise(col("meta.n_bytes")).as("n_bytes"))

  /** Resize pass for image rows (real decode -> scale -> re-encode);
    * non-image rows pass through unchanged.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val rs = udf((p: Array[Byte]) => resizeImage(p, w, h))
    media.withColumn("payload",
      when(col("media_type") === "image", rs(col("payload"))).otherwise(col("payload")))
  }

  /** Frame sampling for video rows: one output row per sampled frame. */
  def sampleFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    val fs = udf((p: Array[Byte]) => frameSampleStub(p, framesPerVideo))
    media
      .filter(col("media_type") === "video")
      .select(col("doc_id"), posexplode(fs(col("payload"))).as(Seq("frame_idx", "frame")))
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
