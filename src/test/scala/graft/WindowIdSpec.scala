package graft

import graft.windowing.{DecayModel, ExponentialWindowing, PowerWindowing, WindowingSpec}
import org.apache.spark.sql.functions._

/** Native window-id kernel: bit parity with the historical UDF formula
  * (interpreted and codegen paths), per-stream spec dispatch, buffered
  * streams, and the end-to-end summarize contract.
  */
class WindowIdSpec extends SparkSpec {
  import spark.implicits._

  private def udfIds(
      specOf: Long => WindowingSpec, bs: Long,
      rows: Seq[(Long, Long, Long)]): Seq[Int] =
    rows.map { case (sid, n, s) =>
      DecayModel.windowIdOf(DecayModel.windowStarts(specOf(sid), n, bs), s)
    }

  private def kernelIds(
      specOf: Long => WindowingSpec, bs: Long,
      rows: Seq[(Long, Long, Long)], codegen: String): Seq[Int] = {
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", codegen)
    try rows.toDF("streamId", "n", "seq")
      .withColumn("wid",
        graft.functions.WindowId.column(specOf, bs, $"streamId", $"n", $"seq"))
      .orderBy($"streamId", $"n", $"seq")
      .select($"wid").as[Int].collect().toSeq
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("parity with the UDF formula: interpreted and codegen, mixed specs and sizes") {
    val specOf: Long => WindowingSpec = sid =>
      if (sid % 2 == 0) ExponentialWindowing(2.0) else PowerWindowing(1, 1, 1, 1)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { _ =>
      val sid = rnd.nextInt(6).toLong
      val n = 1L + rnd.nextInt(100000)
      (sid, n, rnd.nextLong(n).abs)
    }.sortBy(r => (r._1, r._2, r._3))
    val want = udfIds(specOf, 0L, rows)
    assert(kernelIds(specOf, 0L, rows, "NO_CODEGEN") == want, "interpreted mismatch")
    assert(kernelIds(specOf, 0L, rows, "CODEGEN_ONLY") == want, "codegen mismatch")
  }

  test("buffered streams route bufferSize through identically") {
    val specOf: Long => WindowingSpec = _ => ExponentialWindowing(2.0)
    val rows = (0L until 200L).map(s => (1L, 200L, s))
    assert(kernelIds(specOf, 16L, rows, "CODEGEN_ONLY") == udfIds(specOf, 16L, rows))
  }

  test("summarize plan carries the native kernel, not a ScalaUDF") {
    val events = spark.range(1000)
      .select($"id".as("seq"), $"id".as("ts"), lit(1.0).as("value"),
        lit(7L).as("streamId"))
      .as[graft.core.Event]
    val df = graft.core.Summarizer
      .summarize(events, ExponentialWindowing(2.0)).toDF()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_window_id"), s"native kernel missing from plan:\n$plan")
    assert(!plan.contains("UDF("), s"boxed UDF still in the summarize plan:\n$plan")
    // and the anchors: same windows as ever
    assert(df.count() == DecayModel.windowStarts(ExponentialWindowing(2.0), 1000L).length)
  }
}
