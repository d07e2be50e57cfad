package graft

import graft.core.Event
import graft.ops.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.round

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val Sec = 1000000L

  test("gaps-and-islands golden: break at gap >= threshold, half-open") {
    // Gap threshold 10s. Stream 1: events at 0, 5, 15 (gap exactly 10
    // -> NEW session), 18, 40 (gap 22 -> new).
    val ev = Seq(
      Event(1L, 0L, 0L, 1.0), Event(1L, 1L, 5 * Sec, 2.0),
      Event(1L, 2L, 15 * Sec, 4.0), Event(1L, 3L, 18 * Sec, 8.0),
      Event(1L, 4L, 40 * Sec, 16.0)).toDS()
    val got = Sessionize.sessionize(ev, 10 * Sec)
      .orderBy($"session_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 5 * Sec, 3.0),
      (2L, 2L, 15 * Sec, 18 * Sec, 12.0),
      (3L, 1L, 40 * Sec, 40 * Sec, 16.0)))
  }

  test("batch islands agree with streaming session_window on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 60).map { i =>
      // Irregular spacing: bursts with occasional >=30s quiet gaps.
      val t = (i * 7L + (i / 5) * 40L) * Sec
      Event(i % 2L, (i / 2).toLong, t, (i % 5).toDouble)
    }
    val batch = Sessionize.sessionize(events.toDS(), 30 * Sec)
      .select($"stream_id", $"ts_start", $"n", round($"sum_value", 2).as("sum_value"))

    val source = MemoryStream[Event]
    val q = Sessionize.streamingSessions(source.toDS(), "30 seconds", "1 second")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      source.addData(events: _*)
      q.processAllAvailable()
      // Push the watermark far past the last session so everything closes.
      source.addData(Event(0L, 9999L, 100000L * Sec, 0.0))
      source.addData(Event(1L, 9999L, 100001L * Sec, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .filter($"ts_start" < 90000L * Sec) // drop the watermark pushers
        .select($"stream_id", $"ts_start", $"n", round($"sum_value", 2).as("sum_value"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "batch gaps-and-islands and streaming session_window disagree")
    } finally q.stop()
  }
}
