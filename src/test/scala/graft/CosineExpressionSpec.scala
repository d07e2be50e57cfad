package graft

import graft.functions.GraftFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the Scala kernel (interpreted + codegen)") {
    val rows = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(0.5f, -0.25f, 2f), Array(-1f, 4f, 0.125f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f))).toDF("a", "b")
    val got = rows.select(Similarity.cosineCol(spark, $"a", $"b").as("c")).collect().map(_.getDouble(0))
    val want = Seq(
      Similarity.cosine(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      Similarity.cosine(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      Similarity.cosine(Seq(0.5f, -0.25f, 2f), Seq(-1f, 4f, 0.125f)),
      0.0)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"$g vs $w") }
  }

  test("registered in SQL as graft_cosine_native") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine_native(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("null inputs produce null, not a crash") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine_native(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS c").head()
    assert(r.isNullAt(0))
    // Untyped NULL is rejected at analysis with a typed error message.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine_native(NULL, array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("ragged vectors: kernel and native expression agree (prefix norms)") {
    val a = Seq(1f, 1f)
    val b = Seq(1f)
    val kernel = Similarity.cosine(a, b)
    val native = Seq((a.toArray, b.toArray)).toDF("a", "b")
      .select(Similarity.cosineCol(spark, $"a", $"b")).head().getDouble(0)
    assert(kernel == native, s"kernel $kernel != native $native")
    assert(kernel == 1.0) // prefix [1] vs [1]
  }

  test("matches real embedding scores against the driver-side kernel") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20).cache()
    val pairs = embs.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(embs.select($"vec_id".as("ib"), $"embedding".as("vb")))
      .filter($"ia" < $"ib")
    val exprScores = pairs.select($"ia", $"ib", Similarity.cosineCol(spark, $"va", $"vb").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val raw = embs.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    for ((ia, va) <- raw; (ib, vb) <- raw if ia < ib) {
      assert(math.abs(exprScores((ia, ib)) - Similarity.cosine(va, vb)) < 1e-12)
    }
  }
}
