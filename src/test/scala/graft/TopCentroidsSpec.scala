package graft

import graft.functions.{ColumnBridge, TopCentroids}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The native probe kernel must match the Scala reference exactly:
  * Similarity.cosine scores, (score desc, index asc) selection, ragged
  * prefixes, zero-norm rows, n larger than the center count.
  */
class TopCentroidsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(v: Seq[Float], cs: Array[Array[Float]], n: Int): Seq[Int] =
    cs.indices
      .map(c => (c, Similarity.cosine(cs(c).toSeq, v)))
      .sortBy { case (c, s) => (-s, c) }
      .take(n)
      .map(_._1)

  private def probeCol(cs: Array[Array[Float]], n: Int) =
    ColumnBridge.toColumn(TopCentroids(ColumnBridge.toExpression($"v"), cs, n))

  test("matches the Scala reference on random vectors") {
    val rnd = new scala.util.Random(23)
    val cs = Array.fill(13)(Array.fill(12)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 250).map(i => (i.toLong, Seq.fill(12)(rnd.nextFloat() * 2 - 1)))
    val got = vecs.toDF("id", "v").withColumn("p", probeCol(cs, 4))
      .select($"id", $"p").as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) => assert(got(id) == brute(v, cs, 4), s"id=$id") }
  }

  test("zero-norm vector, ragged prefix, and n > #centers") {
    val cs = Array(Array(1f, 0f), Array(0f, 1f, 0f), Array(0.5f, 0.5f))
    val rows = Seq(
      (1L, Seq(0f, 0f)),       // zero norm: all scores 0 -> index order
      (2L, Seq(0f, 9f, 9f)),   // ragged: center 0/2 see 2 dims, center 1 sees 3
      (3L, Seq(1f, 1f)))
    val got = rows.toDF("id", "v").withColumn("p", probeCol(cs, 5))
      .select($"id", $"p").as[(Long, Seq[Int])].collect().toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == brute(v, cs, 5), s"id=$id: ${got(id)} vs ${brute(v, cs, 5)}")
    }
    assert(got(1L) == Seq(0, 1, 2), "ties resolve by ascending center index")
  }

  test("interpreted eval agrees with codegen") {
    val rnd = new scala.util.Random(29)
    val cs = Array.fill(7)(Array.fill(6)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 60).map(i => (i.toLong, Seq.fill(6)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val codegen = df.withColumn("p", probeCol(cs, 3))
      .select($"id", $"p").as[(Long, Seq[Int])].collect().toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.withColumn("p", probeCol(cs, 3))
        .select($"id", $"p").as[(Long, Seq[Int])].collect().toMap
      assert(interp == codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
