package graft

import graft.streaming.StatefulClamp
import graft.streaming.StatefulClamp.Raw
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulClampSpec extends SparkSpec {
  import spark.implicits._

  test("clamp rewrites out-of-order ts to last+1 and keeps state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val q = StatefulClamp(source.toDS())
      .writeStream.format("memory").queryName("clamped")
      .outputMode(OutputMode.Append())
      .start()

    // Reference behavior (core/pipeline.go:81-84): 5, 3 -> 5, 6; 10 stays.
    source.addData(Raw(1L, 5, 1.0, 0), Raw(1L, 3, 2.0, 1), Raw(1L, 10, 3.0, 2))
    q.processAllAvailable()
    // Next batch: state carries lastTs=10 -> 7 clamps to 11.
    source.addData(Raw(1L, 7, 4.0, 3), Raw(1L, 20, 5.0, 4), Raw(2L, 1, 6.0, 0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("clamped").as[graft.core.Event]
      .collect().sortBy(e => (e.streamId, e.seq))
    val s1 = rows.filter(_.streamId == 1L)
    assert(s1.map(_.ts).toSeq == Seq(5L, 6L, 10L, 11L, 20L))
    assert(s1.map(_.seq).toSeq == Seq(0L, 1L, 2L, 3L, 4L)) // dense across batches
    assert(rows.filter(_.streamId == 2L).map(_.seq).toSeq == Seq(0L))
  }

  test("batch arrivalOrder mode is bit-identical to the streaming clamp on shuffled input") {
    val rnd = new scala.util.Random(1234)
    val raw = (0 until 400).map { i =>
      Raw(streamId = i % 5L, ts = rnd.nextInt(1000).toLong, value = i.toDouble, arrival = i.toLong)
    }

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val q = StatefulClamp(source.toDS())
      .writeStream.format("memory").queryName("clamp_parity")
      .outputMode(OutputMode.Append())
      .start()
    // Feed in two batches to exercise cross-batch state.
    source.addData(raw.take(150): _*)
    q.processAllAvailable()
    source.addData(raw.drop(150): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("clamp_parity").as[graft.core.Event]
      .collect().sortBy(e => (e.streamId, e.seq)).toSeq

    val batched = graft.core.Ingest
      .prepare(raw.toDF(), arrivalOrder = true)
      .collect().sortBy(e => (e.streamId, e.seq)).toSeq

    assert(batched == streamed)
  }
}
