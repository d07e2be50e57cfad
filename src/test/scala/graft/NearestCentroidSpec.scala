package graft

import graft.functions.{ColumnBridge, NearestCentroid}
import org.apache.spark.sql.functions._

/** The native assignment kernel must match a driver-side brute force
  * exactly — including tie (first index wins) and zero-norm rules —
  * in both codegen and interpreted eval.
  */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def brute(v: Seq[Float], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestScore = Double.NegativeInfinity
    for (c <- cs.indices) {
      val n = math.min(cs(c).length, v.length)
      var dot = 0.0; var nv = 0.0
      for (i <- 0 until n) { dot += cs(c)(i) * v(i); nv += v(i).toDouble * v(i) }
      val s = if (nv == 0.0) 0.0 else dot / math.sqrt(nv)
      if (s > bestScore) { bestScore = s; best = c }
    }
    best
  }

  private def assignCol(cs: Array[Array[Double]]) =
    ColumnBridge.toColumn(NearestCentroid(ColumnBridge.toExpression($"v"), cs))

  test("matches brute force on random vectors (codegen path)") {
    val rnd = new scala.util.Random(7)
    val cs = Array.fill(9)(graft.ops.Similarity.unit(
      Array.fill(16)(rnd.nextFloat() - 0.5f).toSeq))
    val vecs = (0 until 300).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val got = vecs.toDF("id", "v").withColumn("c", assignCol(cs))
      .select($"id", $"c").as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) => assert(got(id) == brute(v, cs), s"id=$id") }
  }

  test("zero-norm vector scores 0 against every center; first index wins ties") {
    val cs = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows = Seq(
      (1L, Seq(0f, 0f)),          // zero norm: all scores 0, index 0 wins
      (2L, Seq(1f, 1f)),          // exact tie between both centers -> 0
      (3L, Seq(0f, 2f))           // clearly center 1
    ).toDF("id", "v").withColumn("c", assignCol(cs))
      .select($"id", $"c").as[(Long, Int)].collect().toMap
    assert(rows == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("ragged vector truncates to the common prefix") {
    val cs = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0))
    val r = Seq((1L, Seq(0f, 5f, 0f))).toDF("id", "v")
      .withColumn("c", assignCol(cs)).select($"c").as[Int].head()
    assert(r == 1, "center 1 sees only the 2-dim prefix where the mass is")
  }

  test("interpreted eval agrees with codegen") {
    val rnd = new scala.util.Random(11)
    val cs = Array.fill(5)(graft.ops.Similarity.unit(
      Array.fill(8)(rnd.nextFloat() - 0.5f).toSeq))
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val codegen = df.withColumn("c", assignCol(cs))
      .select($"id", $"c").as[(Long, Int)].collect().toMap
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.withColumn("c", assignCol(cs))
        .select($"id", $"c").as[(Long, Int)].collect().toMap
      assert(interp == codegen)
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
