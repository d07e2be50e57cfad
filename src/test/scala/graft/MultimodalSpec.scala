package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.syntheticMedia(docs).cache()

  test("media table has the documented schema and typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val byType = media.groupBy($"media_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == Set("image", "audio", "video"))
    // images carry width/height; audio carries sample_rate
    assert(media.filter($"media_type" === "image" && $"meta.width".isNull).count() == 0)
    assert(media.filter($"media_type" === "audio" && $"meta.sample_rate".isNull).count() == 0)
    assert(media.filter($"meta.n_bytes" =!= length($"payload")).count() == 0)
  }

  test("feature extraction: fixed dim, deterministic, one row per media row") {
    val f1 = Multimodal.extractFeatures(media)
    assert(f1.count() == media.count())
    assert(f1.select($"features").head().getSeq[Float](0).length == Multimodal.FeatureDim)
    // Determinism across runs.
    val a = f1.orderBy($"doc_id").collect().map(_.getSeq[Float](2))
    val b = Multimodal.extractFeatures(media).orderBy($"doc_id").collect().map(_.getSeq[Float](2))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("resize touches only images; frame sampling yields n rows per video") {
    val resized = Multimodal.resizeImages(media, 64, 64)
    val audioUnchanged = media.filter($"media_type" === "audio").select($"doc_id", $"payload")
      .join(resized.select($"doc_id", $"payload".as("p2")), "doc_id")
      .filter(length($"payload") =!= length($"p2"))
    assert(audioUnchanged.count() == 0)

    val frames = Multimodal.sampleFrames(media, framesPerVideo = 4)
    val nVideos = media.filter($"media_type" === "video").count()
    assert(frames.count() == nVideos * 4)
    assert(frames.groupBy($"doc_id").count().filter($"count" =!= 4).count() == 0)
  }

  test("feature stats are scalar, deterministic, and size-consistent") {
    val stats = Multimodal.extractFeatureStats(media).cache()
    assert(stats.count() == media.count())
    // All cells are scalar (sortable by a columnar comparison harness).
    assert(stats.schema.fields.forall(!_.dataType.typeName.startsWith("array")))
    // Audio n_bytes follow the SQL-expressible WAV sizing rule,
    // 44-byte canonical header + 2 bytes per sample (image/video
    // payloads are real PNGs/GIFs — size is the encoder's business).
    val bad = stats.filter($"media_type" === "audio").filter(
      $"n_bytes" =!= (lit(44L) + lit(2L) * (lit(400L) + pmod($"doc_id" * 31L, lit(1200L)))))
    assert(bad.count() == 0)
    // Hash/norm are pure functions of the payload: re-run matches.
    val again = Multimodal.extractFeatureStats(media)
    assert(stats.exceptAll(again).isEmpty && again.exceptAll(stats).isEmpty)
  }

  test("real WAV decode: sample stats match the PCM generation rules exactly") {
    val stats = Multimodal.audioSampleStats(media).collect()
    val nAudio = media.filter($"media_type" === "audio").count()
    assert(stats.length == nAudio && nAudio > 0)
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = Multimodal.audioSamples(id)
      assert(r.getAs[Long]("sample_rate") == Multimodal.AudioRate.toLong)
      assert(r.getAs[Long]("n_samples") == n.toLong)
      val want = (0 until n).map(i => Multimodal.audioSample(id, i).toLong).sum
      assert(r.getAs[Long]("sample_sum") == want, s"decoded sample sum mismatch for doc $id")
    }
  }

  test("real GIF decode: per-frame pixel stats match the generation rules exactly") {
    val stats = Multimodal.videoFrameStats(media).collect()
    val nVideo = media.filter($"media_type" === "video").count()
    assert(stats.map(_.getAs[Long]("doc_id")).distinct.length == nVideo && nVideo > 0)
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val f = r.getAs[Long]("frame_idx")
      val (w, h) = Multimodal.videoDims(id)
      assert(f < Multimodal.videoFrames(id).toLong)
      assert(r.getAs[Long]("width_px") == w.toLong && r.getAs[Long]("height_px") == h.toLong)
      val want = w.toLong * (0 until h).map(y => (y + id + 7L * f) % 256L).sum
      assert(r.getAs[Long]("px_sum") == want, s"decoded pixel sum mismatch for doc $id frame $f")
    }
    // Every generated frame appears: total rows = sum of per-video frame counts.
    val wantRows = media.filter($"media_type" === "video").select($"doc_id")
      .collect().map(r => Multimodal.videoFrames(r.getLong(0)).toLong).sum
    assert(stats.length.toLong == wantRows)
  }

  test("sampled frames are standalone decodable PNGs at the video's dimensions") {
    val one = media.filter($"media_type" === "video").select($"doc_id").head().getLong(0)
    val frames = Multimodal.sampleFrames(media.filter($"doc_id" === one), framesPerVideo = 3)
      .orderBy($"frame_idx").collect()
    assert(frames.length == 3)
    val (w, h) = Multimodal.videoDims(one)
    frames.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      assert(img != null && img.getWidth == w && img.getHeight == h)
    }
  }

  test("real PNG decode: pixel stats match the generation rules exactly") {
    val stats = Multimodal.imagePixelStats(media).collect()
    val nImages = media.filter($"media_type" === "image").count()
    assert(stats.length == nImages && nImages > 0)
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = Multimodal.imageDims(id)
      assert(r.getAs[Long]("width_px") == w.toLong && r.getAs[Long]("height_px") == h.toLong)
      val want = w.toLong * (0 until h).map(y => (y + id) % 256L).sum
      assert(r.getAs[Long]("px_sum") == want, s"decoded pixel sum mismatch for doc $id")
    }
  }

  test("real resize: output decodes to the requested dimensions") {
    val one = Multimodal.resizeImages(media, 48, 32)
      .filter($"media_type" === "image").select($"payload").head().getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one))
    assert(img != null && img.getWidth == 48 && img.getHeight == 32)
  }

  test("size balancing: keeps rows; oversized payloads land in distinct partitions") {
    assert(Multimodal.balanceBySize(media).count() == media.count())
    // 5 payloads ~100x the rest must not co-locate: round-robin on the
    // size-desc rank puts the top-parts rows in distinct partitions.
    val big = (0 until 5).map { i =>
      val n = 100000 + i
      (90000L + i, "video", new Array[Byte](n),
        Multimodal.MediaMeta(Some(320), Some(240), None, Some(1000L), n.toLong))
    }
    val skewed = media.unionByName(
      big.toDF("doc_id", "media_type", "payload", "meta"))
    val balanced = Multimodal.balanceBySize(skewed, targetBytes = 64L << 10)
    assert(balanced.count() == skewed.count())
    val parts = balanced.select($"doc_id")
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .filter($"doc_id" >= 90000L)
      .collect().map(_.getAs[Int]("pid"))
    assert(parts.distinct.length == 5, s"oversized rows co-located: ${parts.mkString(",")}")
  }
}
