package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the bench scale check: decomposes the single-
  * giant-stream summarize at growing n into its stages (scan-only,
  * count agg, join, full) so a rate cliff can be attributed to one
  * stage instead of guessed at. Not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime(); body
      val t1 = System.nanoTime(); body
      val s = math.min(t1 - t0, System.nanoTime() - t1) / 1e9
      println(f"$label%-28s ${s}%8.3f s")
    }

    val ns =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(10000000L, 30000000L, 100000000L)
    for (n <- ns) {
      println(s"== n = $n ==")
      val events = spark.range(n)
        .select($"id".as("seq"), $"id".as("ts"), ($"id" % 97).cast("double").as("value"))
        .withColumn("streamId", lit(998L))
        .as[graft.core.Event]
      time("scan+project only") { force(events.toDF()) }
      val counts = events.groupBy($"streamId").agg(count(lit(1)).as("n"))
      time("count agg") { force(counts) }
      time("join only") { force(events.join(counts, "streamId")) }
      val spec = graft.windowing.ExponentialWindowing(2.0)
      val widOf = udf((sid: Long, cn: Long, seq: Long) =>
        graft.windowing.DecayModel.windowIdOf(
          graft.windowing.DecayModel.windowStarts(spec, cn, 0L), seq))
      time("join+windowId") {
        force(events.join(counts, "streamId")
          .withColumn("windowId", widOf($"streamId", $"n", $"seq")))
      }
      time("full summarize") {
        force(graft.core.Summarizer.summarize(events, spec).toDF())
      }
    }
    spark.sql("SELECT 1").count()
    val plan = graft.core.Summarizer.summarize(
      spark.range(100000000L)
        .select($"id".as("seq"), $"id".as("ts"), ($"id" % 97).cast("double").as("value"))
        .withColumn("streamId", lit(998L)).as[graft.core.Event],
      graft.windowing.ExponentialWindowing(2.0)).toDF()
    plan.explain("formatted")
    spark.stop()
  }
}
