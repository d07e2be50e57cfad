package graft

import graft.functions.{AdcScore, ColumnBridge}

/** The native ADC kernel must match a driver-side LUT fold exactly,
  * in both codegen and interpreted eval, and stay safe on ragged
  * inputs (codes wider than the LUT or vice versa fold over the
  * common prefix).
  */
class AdcScoreSpec extends SparkSpec {
  import spark.implicits._

  private val CodesPerSub = 8

  private def scoreCol() =
    ColumnBridge.toColumn(AdcScore(
      ColumnBridge.toExpression($"lut"), ColumnBridge.toExpression($"codes"),
      CodesPerSub))

  test("matches the driver-side fold; interpreted agrees with codegen") {
    val rnd = new scala.util.Random(31)
    // one flattened m=3 x codes=8 LUT per row, varying across rows like
    // the probe join fans a query's LUT across candidates
    val rows = (0 until 120).map { i =>
      val lut = Seq.fill(3 * CodesPerSub)(rnd.nextFloat() - 0.5f)
      (i.toLong, lut, Seq.fill(3)(rnd.nextInt(CodesPerSub)))
    }
    def brute(lut: Seq[Float], cs: Seq[Int]): Double = {
      val m = math.min(lut.length / CodesPerSub, cs.length)
      (0 until m).map(s => lut(s * CodesPerSub + cs(s)).toDouble).sum
    }
    val df = rows.toDF("id", "lut", "codes")
    val codegen = df.withColumn("s", scoreCol())
      .select($"id", $"s").as[(Long, Double)].collect().toMap
    rows.foreach { case (id, lut, cs) =>
      assert(codegen(id) == brute(lut, cs), s"id=$id")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.withColumn("s", scoreCol())
        .select($"id", $"s").as[(Long, Double)].collect().toMap
      assert(interp == codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("out-of-range code fails loudly (stale sidecar), never reads another subspace") {
    val lut = Seq.tabulate(2 * CodesPerSub)(_.toFloat)
    val df = Seq((1L, lut, Seq(1, CodesPerSub))).toDF("id", "lut", "codes")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e = intercept[Exception] { df.withColumn("s", scoreCol()).collect() }
    assert(messages(e).exists(_.contains("out of range")), s"got: ${messages(e)}")
  }

  test("ragged inputs fold over the common prefix, never out of bounds") {
    val lut = Seq.tabulate(2 * CodesPerSub)(_.toFloat) // m=2 subs worth
    val wide = Seq((1L, lut, Seq(1, 2, 3, 4)))         // 4 code entries
      .toDF("id", "lut", "codes")
    val narrow = Seq((2L, lut, Seq(1)))                // 1 code entry
      .toDF("id", "lut", "codes")
    assert(wide.withColumn("s", scoreCol()).select($"s").as[Double].head()
      == lut(1).toDouble + lut(CodesPerSub + 2).toDouble)
    assert(narrow.withColumn("s", scoreCol()).select($"s").as[Double].head()
      == lut(1).toDouble)
  }
}
