package graft

import graft.core.{Event, StreamMeta, StreamStats, SummaryDB, Summarizer}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Anomaly triage over a LIVE summary store: `anomalousWindows` reads
  * only the materialized decay windows, so the moment streaming ingest
  * lands a batch, the whole retained history is scoreable at O(log N)
  * rows per stream — no raw re-scan, no separate anomaly state. This
  * spec pins (1) streaming == batch parity of the scores and (2) that
  * a planted burst actually surfaces through the streaming path.
  */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  // 200 events on one stream: value 5 everywhere except a planted
  // burst (value 400) in the middle chunk.
  private def eventsSeq: Seq[Event] =
    (0 until 200).map { i =>
      val v = if (i >= 96 && i < 104) 400.0 else 5.0 + (i % 7) * 0.25
      Event(9L, i.toLong, i.toLong, v)
    }

  test("streaming-ingested summary scores == batch summary scores; burst flagged") {
    implicit val sqlCtx = spark.sqlContext
    val meta = StreamMeta.exponential(9L, 2.0)
    val db = SummaryDB.open(spark, Files.createTempDirectory("graft_anom").toString)
    db.newStream(meta)

    val source = MemoryStream[Event]
    val query = StreamingIngest.start(
      source.toDS(), db, Files.createTempDirectory("graft_anom_ckpt").toString)
    eventsSeq.grouped(70).foreach { chunk =>
      source.addData(chunk)
      query.processAllAvailable()
    }
    query.stop()

    val streamed = StreamStats.anomalousWindows(db.summaryWindows)
      .orderBy("stream_id", "bucket").collect().toSeq

    val batchSummary = Summarizer.summarize(eventsSeq.toDS(), meta.spec)
    val batch = StreamStats.anomalousWindows(batchSummary)
      .orderBy("stream_id", "bucket").collect().toSeq

    assert(streamed == batch,
      "streaming-maintained summary must score identically to a batch build")

    // The burst window(s) must carry the dominant z; quiet windows stay low.
    val rows = StreamStats.anomalousWindows(db.summaryWindows)
      .select($"bucket", $"mean", $"z").as[(Long, Double, Option[Double])]
      .collect()
    val burst = rows.filter { case (_, m, _) => m > 50.0 }
    assert(burst.nonEmpty, "planted burst window missing from the summary scores")
    assert(burst.forall(_._3.exists(_ > 3.5)), s"burst not flagged: ${burst.toSeq}")
    // Decay windows mix events unevenly, so quiet windows carry small
    // nonzero z — the triage property is SEPARATION: every burst
    // window outscores every quiet window by an order of magnitude.
    val quietMax = rows.filter { case (_, m, _) => m < 50.0 }
      .flatMap(_._3).maxOption.getOrElse(0.0)
    val burstMin = burst.flatMap(_._3).min
    assert(burstMin > 10.0 * quietMax,
      s"burst/quiet z separation too weak: $burstMin vs $quietMax")
  }
}
