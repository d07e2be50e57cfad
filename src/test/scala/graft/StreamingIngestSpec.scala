package graft

import graft.core.{Event, QueryParams, StreamMeta, SummaryDB}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: micro-batches land in the DB with canonical decay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream").toString
    val db = SummaryDB.open(spark, dir)
    db.newStream(StreamMeta.exponential(5L, 2.0))

    val source = MemoryStream[Event]
    val query = StreamingIngest.start(
      source.toDS(), db, Files.createTempDirectory("graft_ckpt").toString)

    // Three micro-batches totalling the reference's 100-event golden.
    source.addData((0 until 40).map(i => Event(5L, i.toLong, i.toLong, i.toDouble)))
    query.processAllAvailable()
    source.addData((40 until 70).map(i => Event(5L, i.toLong, i.toLong, i.toDouble)))
    query.processAllAvailable()

    // Mid-stream state: decay is canonical for N=70.
    assert(db.summaryWindows.count() ==
      graft.windowing.DecayModel.windowStarts(StreamMeta.exponential(5L, 2.0).spec, 70L).length)

    source.addData((70 until 100).map(i => Event(5L, i.toLong, i.toLong, i.toDouble)))
    query.processAllAvailable()
    query.stop()

    // Final state: the TestBasicDB golden through the streaming path.
    assert(db.summaryWindows.count() == 9)
    val c = db.query(5L, "count", 0, 99, QueryParams())
    assert(c.value == 100.0 && c.error == 0.0)
    val s = db.query(5L, "sum", 0, 99, QueryParams())
    assert(s.value == 4950.0 && s.error == 0.0)
  }
}
