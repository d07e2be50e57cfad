package graft

import graft.functions.{ColumnBridge, PqEncode}

/** The native PQ encode kernel must match a driver-side brute force
  * (unit-normalize, ceil(d/m) subspace split, squared-L2 nearest code,
  * first-wins ties) in both codegen and interpreted eval.
  */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def brute(v: Seq[Float], books: Array[Array[Array[Double]]]): Seq[Int] = {
    val d = v.map(_.toDouble).toArray
    val norm = math.sqrt(d.map(x => x * x).sum)
    val u = if (norm == 0) d else d.map(_ / norm)
    val m = books.length
    val w = (d.length + m - 1) / m
    (0 until m).map { s =>
      val lo = s * w; val hi = math.min(lo + w, d.length)
      val sv = if (lo >= hi) Array.emptyDoubleArray else u.slice(lo, hi)
      var best = 0; var bestD = Double.PositiveInfinity
      for (c <- books(s).indices) {
        val cw = books(s)(c)
        val n = math.min(cw.length, sv.length)
        var dist = 0.0
        for (j <- 0 until n) { val t = cw(j) - sv(j); dist += t * t }
        if (dist < bestD) { bestD = dist; best = c }
      }
      best
    }
  }

  private def encCol(books: Array[Array[Array[Double]]]) =
    ColumnBridge.toColumn(PqEncode(ColumnBridge.toExpression($"v"), books))

  test("matches brute force on random vectors, ragged m, zero vector") {
    val rnd = new scala.util.Random(13)
    // m=3 over d=8: ragged split (3,3,2).
    val books = Array.fill(3)(Array.fill(4)(Array.fill(3)(rnd.nextDouble() - 0.5)))
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))) :+ (999L, Seq.fill(8)(0f))
    val got = vecs.toDF("id", "v").withColumn("c", encCol(books))
      .select($"id", $"c").as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) => assert(got(id) == brute(v, books), s"id=$id") }
  }

  test("interpreted eval agrees with codegen") {
    val rnd = new scala.util.Random(17)
    val books = Array.fill(2)(Array.fill(5)(Array.fill(4)(rnd.nextDouble() - 0.5)))
    val vecs = (0 until 40).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val codegen = df.withColumn("c", encCol(books))
      .select($"id", $"c").as[(Long, Seq[Int])].collect().toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.withColumn("c", encCol(books))
        .select($"id", $"c").as[(Long, Seq[Int])].collect().toMap
      assert(interp == codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
