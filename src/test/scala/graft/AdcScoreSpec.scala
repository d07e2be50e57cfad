package graft

import graft.functions.{AdcScore, ColumnBridge}

/** The native ADC kernel must match the driver-side LUT fold exactly,
  * in both codegen and interpreted eval, and fail loudly on a query
  * id with no LUT.
  */
class AdcScoreSpec extends SparkSpec {
  import spark.implicits._

  private def luts(): java.util.HashMap[java.lang.Long, Array[Array[Float]]] = {
    val rnd = new scala.util.Random(31)
    val m = new java.util.HashMap[java.lang.Long, Array[Array[Float]]]()
    (0L until 4L).foreach { qid =>
      m.put(qid, Array.fill(3)(Array.fill(8)(rnd.nextFloat() - 0.5f)))
    }
    m
  }

  private def scoreCol(m: java.util.HashMap[java.lang.Long, Array[Array[Float]]]) =
    ColumnBridge.toColumn(AdcScore(
      ColumnBridge.toExpression($"qid"), ColumnBridge.toExpression($"codes"), m))

  test("matches the driver-side fold; interpreted agrees with codegen") {
    val m = luts()
    val rnd = new scala.util.Random(37)
    val rows = (0 until 120).map { i =>
      (i.toLong, (i % 4).toLong, Seq.fill(3)(rnd.nextInt(8)))
    }
    def brute(qid: Long, cs: Seq[Int]): Double = {
      val lut = m.get(qid)
      cs.indices.take(lut.length).map(s => lut(s)(cs(s)).toDouble).sum
    }
    val df = rows.toDF("id", "qid", "codes")
    val codegen = df.withColumn("s", scoreCol(m))
      .select($"id", $"s").as[(Long, Double)].collect().toMap
    rows.foreach { case (id, qid, cs) =>
      assert(codegen(id) == brute(qid, cs), s"id=$id")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.withColumn("s", scoreCol(m))
        .select($"id", $"s").as[(Long, Double)].collect().toMap
      assert(interp == codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("unknown query id fails loudly, not silently as zero") {
    val m = luts()
    val df = Seq((1L, 99L, Seq(0, 0, 0))).toDF("id", "qid", "codes")
    val e = intercept[Exception] {
      df.withColumn("s", scoreCol(m)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("no LUT"))))
  }
}
