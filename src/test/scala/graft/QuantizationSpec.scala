package graft

import graft.ops.Quantization
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("quantized values are int8-ranged and zero vectors stay zero") {
    val q = Quantization.quantizeInt8(emb, "embedding")
    val outOfRange = q.select(explode($"q_vec").as("qq")).filter(abs($"qq") > 127L)
    assert(outOfRange.count() == 0)
    // Zero vector: all-zero quantization, no NaN/divide-by-zero.
    val z = Seq((9999L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val zr = Quantization.quantizeInt8(z, "embedding")
      .select($"q_scale", $"q_vec").head()
    assert(zr.getDouble(0) == 0.0)
    assert(zr.getAs[scala.collection.Seq[Long]](1).forall(_ == 0L))
  }

  test("round-trip reconstruction error is bounded by scale/254 per element") {
    val deq = Quantization.dequantize(Quantization.quantizeInt8(emb, "embedding"))
      .select($"vec_id", $"embedding", $"deq_vec", $"q_scale")
    val bad = deq
      .select($"vec_id", $"q_scale",
        aggregate(
          zip_with($"embedding", $"deq_vec", (a, b) => abs(a.cast("double") - b)),
          lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"))
      .filter($"max_err" > $"q_scale" / 254.0 + 1e-12)
    assert(bad.count() == 0, "reconstruction error above the rounding bound")
  }

  test("dequantized cosine similarity to the original is ~1") {
    val deq = Quantization.dequantize(Quantization.quantizeInt8(emb, "embedding"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, e) => acc + e)
    val cos = deq.select(
      (dot($"embedding", $"deq_vec") /
        (sqrt(dot($"embedding", $"embedding")) * sqrt(dot($"deq_vec", $"deq_vec"))))
        .as("c"))
    assert(cos.filter($"c" < 0.999).count() == 0, "int8 quantization lost too much geometry")
  }

  test("stats surface is deterministic and scalar-only") {
    val s1 = Quantization.quantizeStats(emb, "embedding", "vec_id")
    assert(s1.schema.fields.forall(!_.dataType.typeName.startsWith("array")))
    assert(s1.count() == emb.count())
    val s2 = Quantization.quantizeStats(emb, "embedding", "vec_id")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }
}
