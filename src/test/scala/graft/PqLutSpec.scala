package graft

import graft.functions.{ColumnBridge, PqLut}
import graft.ops.{ProductQuantization => PQ, Similarity}

/** The native per-query LUT kernel must reproduce the driver-side
  * build (unit-normalize, per-sub dot against every codeword) bit for
  * bit, in both codegen and interpreted eval — it replaced a driver
  * loop over the collected query batch, so this parity IS the
  * correctness argument for moving the build executor-side.
  */
class PqLutSpec extends SparkSpec {
  import spark.implicits._

  private def books(m: Int, codes: Int, subDim: Int, seed: Int): PQ.Codebooks = {
    val rnd = new scala.util.Random(seed)
    Array.fill(m)(Array.fill(codes)(Array.fill(subDim)(rnd.nextDouble() - 0.5)))
  }

  private def driverLut(v: Seq[Float], bk: PQ.Codebooks, m: Int): Array[Float] = {
    val u = Similarity.unit(v)
    val codes = bk(0).length
    val out = new Array[Float](m * codes)
    for (s <- 0 until m) {
      val qsub = PQ.subSlice(u, m, s)
      for (c <- 0 until codes) {
        val w = bk(s)(c)
        val n = math.min(w.length, qsub.length)
        var d = 0.0; var i = 0
        while (i < n) { d += w(i) * qsub(i); i += 1 }
        out(s * codes + c) = d.toFloat
      }
    }
    out
  }

  test("matches the driver-side LUT build; interpreted agrees with codegen") {
    val m = 4; val codes = 8; val dim = 16
    val bk = books(m, codes, dim / m, seed = 11)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 60).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    def lutCol() = ColumnBridge.toColumn(PqLut(ColumnBridge.toExpression($"v"), bk))
    val codegen = df.withColumn("lut", lutCol())
      .select($"id", $"lut").as[(Long, Seq[Float])].collect().toMap
    rows.foreach { case (id, v) =>
      assert(codegen(id) == driverLut(v, bk, m).toSeq, s"id=$id")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.withColumn("lut", lutCol())
        .select($"id", $"lut").as[(Long, Seq[Float])].collect().toMap
      assert(interp == codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("edges: zero vector, ragged m not dividing d") {
    val m = 3; val codes = 4; val dim = 8 // width ceil(8/3)=3, last sub = 2 dims
    val bk = books(m, codes, 3, seed = 17)
    val df = Seq(
      (0L, Seq.fill(dim)(0f)),
      (1L, (1 to dim).map(_.toFloat))).toDF("id", "v")
    val got = df.withColumn("lut",
        ColumnBridge.toColumn(PqLut(ColumnBridge.toExpression($"v"), bk)))
      .select($"id", $"lut").as[(Long, Seq[Float])].collect().toMap
    assert(got(0L) == driverLut(Seq.fill(dim)(0f), bk, m).toSeq)
    assert(got(1L) == driverLut((1 to dim).map(_.toFloat), bk, m).toSeq)
    assert(got(1L).length == m * codes)
  }
}
