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
    // n_bytes follows the SQL-expressible sizing rule.
    val bad = stats.filter(
      $"n_bytes" =!= (lit(256L) + pmod($"doc_id" * 2654435761L, lit(768L))))
    assert(bad.count() == 0)
    // Hash/norm are pure functions of the payload: re-run matches.
    val again = Multimodal.extractFeatureStats(media)
    assert(stats.exceptAll(again).isEmpty && again.exceptAll(stats).isEmpty)
  }

  test("size balancing keeps all rows") {
    assert(Multimodal.balanceBySize(media).count() == media.count())
  }
}
