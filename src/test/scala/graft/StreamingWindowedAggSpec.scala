package graft

import graft.core.Event
import graft.streaming.StreamingWindowedAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingWindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private val Sec = 1000000L // micros

  test("tumbling windows finalize once past the watermark; late events drop") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = StreamingWindowedAgg
      .tumbling(source.toDS(), windowLength = "10 seconds", lateness = "5 seconds")
      .writeStream.format("memory").queryName("wtumble").outputMode("append").start()
    try {
      // Window [0s,10s): three on-time events, out of order within it.
      source.addData(
        Event(1L, 0L, 2 * Sec, 1.0),
        Event(1L, 1L, 8 * Sec, 2.0),
        Event(1L, 2L, 5 * Sec, 4.0))
      q.processAllAvailable()
      // Append mode: nothing emitted while the window can still grow.
      assert(spark.table("wtumble").count() == 0)

      // Advance event time far enough that the watermark (max - 5s)
      // passes 10s -> [0s,10s) finalizes with exactly the 3 events.
      source.addData(Event(1L, 3L, 20 * Sec, 8.0))
      q.processAllAvailable()
      // A late arrival INTO the finalized window must be discarded.
      source.addData(Event(1L, 4L, 3 * Sec, 100.0))
      q.processAllAvailable()
      // Push the watermark past [20s,30s) to flush the rest.
      source.addData(Event(1L, 5L, 40 * Sec, 16.0))
      q.processAllAvailable()

      val rows = spark.table("wtumble")
        .select($"stream_id", $"ws", $"we", $"n", $"sum", $"max", $"min", $"n_distinct")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
        .sortBy(_._2)
      // [0,10): the 3 on-time events only (late 100.0 dropped), three
      // distinct values; [20,30): the single 8.0 event. [40,50) open.
      assert(rows.toSeq == Seq(
        (1L, 0L, 10 * Sec, 3L, 7.0, 4.0, 1.0, 3L),
        (1L, 20 * Sec, 30 * Sec, 1L, 8.0, 8.0, 8.0, 1L)))
    } finally q.stop()
  }

  test("bucket sketches finalize with the batch wire formats and answer probes") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = StreamingWindowedAgg
      .tumblingWithSketches(source.toDS(), "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("wsketch").outputMode("append").start()
    try {
      source.addData(
        Event(1L, 0L, 2 * Sec, 7.0),
        Event(1L, 1L, 8 * Sec, 7.0),
        Event(1L, 2L, 5 * Sec, 4.0))
      q.processAllAvailable()
      source.addData(Event(1L, 3L, 20 * Sec, 8.0)) // watermark past [0,10)
      q.processAllAvailable()
      val row = spark.table("wsketch").filter($"ws" === 0L).collect().head
      // bloom: present values probe true, absent false (tiny filter).
      val bloom = row.getAs[Array[Byte]]("bloom")
      assert(graft.functions.Sketches.mightContain(bloom, "7.0"))
      assert(graft.functions.Sketches.mightContain(bloom, "4.0"))
      assert(!graft.functions.Sketches.mightContain(bloom, "9.0"))
      // cms: exact at this cardinality.
      val cms = row.getAs[Array[Byte]]("cms")
      assert(graft.functions.Sketches.cmsEstimate(cms, "7.0") == 2L)
      assert(graft.functions.Sketches.cmsEstimate(cms, "4.0") == 1L)
      // candidates: both keys present with true counts (no eviction).
      val cand = row.getAs[Map[String, Long]]("cand")
      assert(cand == Map("7.0" -> 2L, "4.0" -> 1L), s"cand=$cand")
      // the formats are the batch table's: the union aggregators accept
      // them (one-row merge round-trip).
      val merged = Seq((1L, bloom)).toDF("g", "b")
        .groupBy($"g").agg(graft.functions.Sketches.bloomUnionAgg($"b").as("m"))
        .collect().head.getAs[Array[Byte]]("m")
      assert(graft.functions.Sketches.mightContain(merged, "7.0"))
      // quantile sketch: exact at this size (err 0, batch wire format).
      val qs = graft.functions.QuantileSketch.fromBytes(row.getAs[Array[Byte]]("qsk"))
      assert(qs.n == 3L && qs.err == 0L)
      assert(qs.quantile(0.5) == 7.0 && qs.quantile(0.01) == 4.0)
    } finally q.stop()
  }

  test("batch execution of the same transform agrees with a plain groupBy") {
    val events = (0 until 100).map { i =>
      Event(i % 3L, i / 3L, (i * 700000L), (i % 13).toDouble)
    }
    val viaOp = StreamingWindowedAgg.tumbling(events.toDS(), "10 seconds", "5 seconds")
    val expected = events.toDS()
      .groupBy($"streamId".as("stream_id"),
        (($"ts" - ($"ts" % (10 * Sec)))).as("ws"))
      .agg(org.apache.spark.sql.functions.count($"value").as("n"))
      .select($"stream_id", $"ws", $"n")
    val got = viaOp.select($"stream_id", $"ws", $"n")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
