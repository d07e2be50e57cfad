package graft

import graft.core._
import graft.windowing.{DecayModel, ExponentialWindowing}

/** Scale demonstration: a single 1M-element stream decays to ~40
  * windows (the N -> O(log N) compression that is the engine's reason
  * to exist), the decomposition is the canonical closed form, full
  * range queries stay exact, and partial ranges stay O(windows) work.
  */
class ScaleDemoSpec extends SparkSpec {
  import spark.implicits._

  test("1M-element stream: O(log N) windows, exact full-range query") {
    val n = 1000000
    val exp2 = ExponentialWindowing(2.0)
    val events = spark.range(n.toLong)
      .select($"id".as("seq"), $"id".as("ts"), ($"id" % 97).cast("double").as("value"))
      .withColumn("streamId", org.apache.spark.sql.functions.lit(11L))
      .as[Event]

    val t0 = System.nanoTime()
    val sw = Summarizer.summarize(events, exp2).cache()
    val nWindows = sw.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    // Canonical decomposition size (closed form, O(log N)).
    assert(nWindows == DecayModel.windowStarts(exp2, n.toLong).length)
    assert(nWindows < 64, s"compression failed: $nWindows windows for $n elements")
    info(f"1M rows -> $nWindows windows in $buildSec%.1fs (${n / buildSec}%.0f rows/s)")

    val lw = spark.emptyDataset[LandmarkWindow]
    val c = QueryEngine.queryOne(sw, lw, 11L, "count", 0, n - 1L)
    assert(c.value == n.toDouble && c.error == 0.0)

    // Partial range: answered from O(log N) windows with a bounded CI.
    val tq = System.nanoTime()
    val part = QueryEngine.queryOne(sw, lw, 11L, "count", n / 4L, n / 2L)
    val qMs = (System.nanoTime() - tq) / 1e6
    val exact = (n / 2L - n / 4L + 1).toDouble
    assert(math.abs(part.value - exact) <= part.error + 1e-6 || part.error == 0.0)
    info(f"partial-range query in $qMs%.0f ms -> ${part.value}%.0f +- ${part.error}%.1f (exact $exact%.0f)")
  }
}
