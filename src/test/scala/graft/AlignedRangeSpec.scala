package graft

import graft.core.{Ingest, QueryEngine, Summarizer, SummaryWindow}
import graft.windowing.{DecayModel, ExponentialWindowing}
import org.apache.spark.sql.functions._

/** Boundary-sensitive checks: the estimator over window-aligned ranges
  * must be exact AND must cover exactly the element prefix the
  * decomposition dictates. A summarizer that shifted any boundary fails
  * here (and in the matching DuckDB oracles q_aligned_range/2).
  */
class AlignedRangeSpec extends SparkSpec {
  import spark.implicits._

  private val spec = ExponentialWindowing(2.0)

  private lazy val events =
    Ingest.fromEventsTable(spark, "/root/testdata/sf0.001").cache()
  private lazy val summary = Summarizer.summarize(events, spec).cache()

  private def rawPrefix(numWindows: Int): Map[Long, (Long, Double)] = {
    val perStream = events
      .groupByKey(_.streamId)
      .mapGroups { (sid, it) => (sid, it.toArray.sortBy(e => (e.ts, e.seq))) }
      .collect()
    perStream.flatMap { case (sid, es) =>
      val starts = DecayModel.windowStarts(spec, es.length.toLong)
      if (starts.length < numWindows) None
      else {
        val k =
          if (starts.length == numWindows) es.length.toLong
          else starts(numWindows)
        val pre = es.take(k.toInt)
        Some(sid -> (k, pre.map(_.value).sum))
      }
    }.toMap
  }

  for (nw <- Seq(1, 2))
    test(s"aligned prefix of $nw window(s): exact and boundary-correct") {
      val got = QueryEngine.alignedPrefixAll(summary, nw)
        .select($"stream_id", $"cnt", $"sum_value")
        .as[(Long, Long, Double)]
        .collect()
        .map { case (sid, c, sv) => sid -> (c, sv) }
        .toMap
      val want = rawPrefix(nw)
      assert(got.keySet == want.keySet)
      want.foreach { case (sid, (k, s)) =>
        val (gc, gs) = got(sid)
        assert(gc == k, s"stream $sid: cnt $gc != $k")
        assert(math.abs(gs - math.rint(s * 100) / 100) < 1e-6,
          s"stream $sid: sum $gs != $s")
      }
    }

  test("a shifted boundary is detected (negative control)") {
    // Corrupt the summary: move one element's worth of aggregate across
    // the first boundary of one stream by shifting w0.te to w1.ts. The
    // aligned query must now disagree with the raw prefix (the estimator
    // sees a partial overlap -> stream vanishes, or covers extra mass).
    val sid0 = summary.head().streamId
    val corrupted = summary
      .groupByKey(_.streamId)
      .flatMapGroups { (sid, it) =>
        val ws = it.toArray.sortBy(_.ts)
        if (sid != sid0 || ws.length < 2) ws.iterator
        else {
          // swallow w1's span into w0 (te := w1.te), keep aggregates: a
          // boundary now sits in the wrong place
          val w0 = ws(0).copy(te = ws(1).te)
          Iterator(w0) ++ ws.iterator.drop(1)
        }
      }
    val got = QueryEngine.alignedPrefixAll(corrupted, 1)
      .filter($"stream_id" === sid0)
      .as[(Long, Long, Double)]
      .collect()
    val want = rawPrefix(1)(sid0)
    assert(got.isEmpty || (got(0)._2, got(0)._3) != want,
      "corrupted boundary went undetected")
  }
}
