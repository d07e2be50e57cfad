package graft

import graft.ops.Funnel
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FunnelEvent, Progress}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming funnel twin: on ts-ordered batch splits the final per-user
  * state equals the batch operator row for row, progress rows emit only
  * on change, state never grows past three longs per user.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")
  private val window = 100L

  // Users covering: full conversion, stuck at 1 and 2, window expiry,
  // step skipping, repeat anchors, interleaved ties.
  private def events: Seq[FunnelEvent] = Seq(
    FunnelEvent(1L, 10L, "view"), FunnelEvent(1L, 20L, "click"), FunnelEvent(1L, 30L, "buy"),
    FunnelEvent(2L, 10L, "view"), FunnelEvent(2L, 15L, "click"),
    FunnelEvent(3L, 10L, "click"), FunnelEvent(3L, 20L, "buy"), // never views
    FunnelEvent(4L, 0L, "view"), FunnelEvent(4L, 50L, "click"), FunnelEvent(4L, 101L, "buy"),
    FunnelEvent(5L, 0L, "view"), FunnelEvent(5L, 10L, "buy"), // skips click
    FunnelEvent(6L, 0L, "view"), FunnelEvent(6L, 90L, "view"),
    FunnelEvent(6L, 95L, "click"), FunnelEvent(6L, 150L, "buy"), // late buy vs first anchor
    FunnelEvent(7L, 5L, "view"), FunnelEvent(7L, 5L, "click")) // tie: not strictly after

  private def runStreaming(batches: Seq[Seq[FunnelEvent]], name: String): Map[Long, (Int, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.funnel(source.toDS(), steps, window)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    q.stop()
    // Update mode: the LAST row per user is the final state.
    spark.table(name).as[Progress].collect()
      .groupBy(_.userId).map { case (u, rows) =>
        val last = rows.maxBy(_.depth)
        u -> (last.depth, last.t1)
      }
  }

  private def batchExpected: Map[Long, (Int, Long)] =
    Funnel.funnel(events.toDF("user_id", "ts_us", "event_type"), steps, window,
        tsCol = "ts_us")
      .as[(Long, Int, Long)].collect()
      .map { case (u, d, t1) => u -> (d, t1) }.toMap

  test("final state equals the batch funnel on ts-ordered batch splits") {
    val ordered = events.sortBy(_.ts)
    val n = ordered.size
    val splits = Seq(
      Seq(ordered),                                        // one batch
      Seq(ordered.take(n / 2), ordered.drop(n / 2)),       // two
      ordered.grouped(3).toSeq)                            // many small
    splits.zipWithIndex.foreach { case (batches, i) =>
      val got = runStreaming(batches, s"fnl_parity_$i")
      assert(got == batchExpected, s"split $i: $got vs $batchExpected")
    }
  }

  test("progress rows emit only on change") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.funnel(source.toDS(), steps, window)
      .writeStream.format("memory").queryName("fnl_changes")
      .outputMode(OutputMode.Update())
      .start()
    source.addData(Seq(FunnelEvent(1L, 10L, "view"))); q.processAllAvailable()
    source.addData(Seq(FunnelEvent(1L, 12L, "view"))); q.processAllAvailable() // no change
    source.addData(Seq(FunnelEvent(1L, 20L, "click"))); q.processAllAvailable()
    q.stop()
    val rows = spark.table("fnl_changes").as[Progress].collect().toSeq
    assert(rows == Seq(Progress(1L, 1, 10L), Progress(1L, 2, 10L)))
  }
}
