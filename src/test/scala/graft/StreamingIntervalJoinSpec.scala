package graft

import graft.streaming.StreamingIntervalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Top-level for the Dataset encoder (Janino cannot reach nested test
  * classes — same constraint as the main-source streaming row types).
  */
case class SijFact(k: Long, ts: Long)
case class SijIval(k: Long, lo: Long, hi: Long, tag: String)

class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private type F = SijFact
  private type I = SijIval
  // Event times sit WELL above epoch 0: the initial watermark is 0, and
  // stateful operators late-drop rows at-or-below it — an interval
  // starting at t=0 would vanish before its first join.
  private val B = 1000000000L
  private def F(k: Long, ts: Long) = SijFact(k, B + ts)
  private def I(k: Long, lo: Long, hi: Long, tag: String) = SijIval(k, B + lo, B + hi, tag)

  test("streaming == batch interval join on the same data, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val fs = MemoryStream[F]
    val is = MemoryStream[I]
    val joined = StreamingIntervalJoin.join(
      fs.toDS().toDF(), is.toDS().toDF(),
      key = "k", tsCol = "ts", loCol = "lo", hiCol = "hi",
      maxSpanMicros = 100L)
    val q = joined.select($"k", $"ts", $"tag")
      .writeStream.format("memory").queryName("sij_out")
      .outputMode(OutputMode.Append()).start()

    // Interleaved arrival across micro-batches: facts before their
    // interval and after.
    fs.addData(F(1, 5), F(1, 10), F(2, 10))
    is.addData(I(1, 0, 10, "a"))
    q.processAllAvailable()
    is.addData(I(1, 10, 20, "b"), I(2, 0, 4, "c"))
    fs.addData(F(1, 15))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sij_out")
      .collect().map(r => (r.getLong(0), r.getLong(1) - B, r.getString(2))).toSet
    // Batch reference on the union of all data.
    val factsB = Seq(F(1, 5), F(1, 10), F(2, 10), F(1, 15)).toDF()
    val ivalsB = Seq(I(1, 0, 10, "a"), I(1, 10, 20, "b"), I(2, 0, 4, "c")).toDF()
    val want = graft.ops.IntervalJoin
      .join(factsB, ivalsB, "ts", "lo", "hi", keys = Seq("k"), bucketWidth = 7L)
      .select($"k", $"ts", $"tag")
      .collect().map(r => (r.getLong(0), r.getLong(1) - B, r.getString(2))).toSet
    assert(got == want)
    assert(got == Set((1L, 5L, "a"), (1L, 10L, "a"), (1L, 10L, "b"), (1L, 15L, "b")))
  }

  test("span cap is enforced as a join bound, not just documented") {
    implicit val sqlCtx = spark.sqlContext
    val fs = MemoryStream[F]
    val is = MemoryStream[I]
    // Interval wider than maxSpan: the state-bounding conjunct
    // (__ft <= __it + maxSpan) clips matches beyond the cap — facts
    // inside [lo, lo+span] still match, later ones do not.
    val joined = StreamingIntervalJoin.join(
      fs.toDS().toDF(), is.toDS().toDF(),
      key = "k", tsCol = "ts", loCol = "lo", hiCol = "hi", maxSpanMicros = 10L)
    val q = joined.select($"k", $"ts", $"tag")
      .writeStream.format("memory").queryName("sij_cap")
      .outputMode(OutputMode.Append()).start()
    is.addData(I(1, 0, 1000, "wide"))
    fs.addData(F(1, 5), F(1, 50))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sij_cap").collect().map(r => (r.getLong(0), r.getLong(1) - B)).toSet
    assert(got == Set((1L, 5L)), s"span cap not applied: $got")
  }
}
