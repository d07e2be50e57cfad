package graft

import graft.core.{Event, StreamStats, Summarizer}
import graft.windowing.ExponentialWindowing
import org.apache.spark.sql.functions._

/** Tumbling-bucket and summary-window anomaly scoring: robust
  * median/MAD baselines, planted-outlier detection, and the
  * summary-table variant's agreement with a raw recomputation.
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  /** 1 stream, 20 buckets of 10 events each: normal buckets have
    * exact means 5.0 + (b%5)·0.1 (so MAD > 0), bucket 13 is planted at
    * mean 50.0.
    */
  private def events: org.apache.spark.sql.Dataset[Event] = {
    val rows = for {
      b <- 0L until 20L
      i <- 0L until 10L
    } yield Event(1L, b * 10 + i, b * 1000L + i,
      if (b == 13) 50.0 else 3.0 + (i % 5) + (b % 5) * 0.1)
    rows.toDS()
  }

  test("planted outlier bucket gets a large z; normal buckets stay small") {
    val out = StreamStats.anomalyScores(events, widthMicros = 1000L)
      .select($"bucket", $"mean", $"z").as[(Long, Double, Option[Double])]
      .collect().sortBy(_._1)
    assert(out.length == 20)
    val z13 = out(13)._3.get
    assert(out(13)._2 == 50.0 && z13 > 10.0, s"planted bucket z=$z13")
    out.filter(_._1 != 13L).foreach { case (b, m, z) =>
      assert(m < 6.0 && z.get < 2.0, s"normal bucket $b mean=$m z=$z")
    }
  }

  test("all-identical means: MAD = 0 yields null z, no crash") {
    val flat = (0L until 40L).map(i => Event(2L, i, i * 10, 7.0)).toDS()
    val out = StreamStats.anomalyScores(flat, widthMicros = 100L)
      .select($"z").as[Option[Double]].collect()
    assert(out.nonEmpty && out.forall(_.isEmpty))
  }

  test("summary-window variant agrees with recomputing from raw window means") {
    val spec = ExponentialWindowing(2.0)
    val summary = Summarizer.summarize(events, spec)
    val got = StreamStats.anomalousWindows(summary)
      .select($"bucket", $"n", $"mean", $"med", $"mad", $"z")
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().sortBy(_._1)
    // Independent recomputation: per-window means from the summary
    // rows, then median/MAD in plain Scala.
    val wins = summary.select($"cs", $"count", $"sum")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val means = wins.map(w => w._3 / w._2)
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val med = medianOf(means)
    val mad = medianOf(means.map(m => math.abs(m - med)))
    assert(got.length == wins.length)
    got.zip(wins).foreach { case ((cs, n, mean, gmed, gmad, z), (wcs, wc, ws)) =>
      assert(cs == wcs && n == wc.toLong)
      assert(math.abs(mean - ws / wc) < 1e-12)
      assert(math.abs(gmed - med) < 1e-12 && math.abs(gmad - mad) < 1e-12)
      if (mad > 0) assert(math.abs(z.get - math.abs(mean - med) / (1.4826 * mad)) < 1e-9)
    }
  }
}
