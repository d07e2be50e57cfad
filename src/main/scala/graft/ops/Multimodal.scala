package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The decode kernels are STUBS — deterministic fakes standing in for
  * codec libraries that are not in this container. Everything around
  * them is the real production shape: schema, per-partition batch
  * processing (one codec init per partition, not per row — the same
  * contract a JNI/FFI decoder or a Python `mapInPandas` worker needs),
  * and size-aware partitioning so a handful of 100 MB videos cannot
  * skew one task.
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

  /** Payload size rule: SQL-expressible on purpose (Knuth multiplicative
    * hash, mod range) so the media table's sizes can be oracled by an
    * external engine: `256 + (doc_id * 2654435761) % 768`.
    */
  def payloadBytes(id: Long): Long = 256L + math.floorMod(id * 2654435761L, 768L)

  /** Deterministic synthetic media table derived from a documents table
    * — test/bench stand-in for a real ingest of binary files.
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val gen = udf { (id: Long) =>
      val rnd = new scala.util.Random(id * 0x9E3779B9L)
      val kinds = Array("image", "audio", "video")
      val mt = kinds(math.floorMod(id, 3L).toInt)
      val n = payloadBytes(id).toInt
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      val meta = mt match {
        case "image" => MediaMeta(Some(64 + rnd.nextInt(512)), Some(64 + rnd.nextInt(512)), None, None, n.toLong)
        case "audio" => MediaMeta(None, None, Some(16000), Some(1000L + rnd.nextInt(60000)), n.toLong)
        case _       => MediaMeta(Some(320), Some(240), None, Some(1000L + rnd.nextInt(120000)), n.toLong)
      }
      GenMedia(mt, bytes, meta)
    }
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .withColumn("m", gen(col("doc_id")))
      .select(col("doc_id"), col("m.media_type").as("media_type"),
        col("m.payload").as("payload"), col("m.meta").as("meta"))
  }

  val FeatureDim = 32

  /** STUB decoder: stands in for an image/audio codec. Deterministic
    * function of the payload bytes so tests are stable. A real build
    * replaces ONLY this function (same signature — bytes in, fixed-dim
    * features out); the Spark plumbing around it is unchanged.
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

  /** STUB resize: a real implementation re-encodes pixels; the stub
    * truncates/pads deterministically, preserving the contract that
    * output size is a pure function of (payload, w, h).
    */
  private[ops] def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(16, math.min(payload.length, (w * h) / 64))
    java.util.Arrays.copyOf(payload, n)
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
        // (real codec: initialize decoder context here, once per task)
        it.map { case (id, mt, payload) => (id, mt, decodeToFeaturesStub(payload)) }
      }
      .toDF("doc_id", "media_type", "features")
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
        // (real codec: initialize decoder context here, once per task)
        it.map { case (id, mt, payload) =>
          val f = decodeToFeaturesStub(payload)
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
    * surface (sizes follow [[payloadBytes]], types follow doc_id mod 3).
    */
  def mediaSummary(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"), col("meta.n_bytes").as("n_bytes"))

  /** Resize pass for image rows; non-image rows pass through unchanged. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val rs = udf((p: Array[Byte]) => resizeStub(p, w, h))
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

  /** Size-aware repartitioning: spread payload bytes evenly so decode
    * tasks are balanced (a plain hash partition lets a few huge videos
    * serialize one task at 100 TB). `targetBytes` ~ executor-comfortable
    * batch size.
    */
  def balanceBySize(media: DataFrame, targetBytes: Long = 64L << 20): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // sum() over zero rows is NULL — coalesce before getLong.
    val total = media.select(coalesce(sum(col("meta.n_bytes")), lit(0L))).head().getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    // Salt by cumulative-size bucket approximation: hash on doc_id into
    // enough partitions that expected bytes/partition <= targetBytes.
    media.repartition(parts, $"doc_id")
  }
}
