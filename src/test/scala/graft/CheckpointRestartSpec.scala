package graft

import graft.core.{Event, QueryParams, StreamMeta, SummaryDB}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.Encoders
import java.nio.file.Files

/** Recovery golden: the streaming checkpoint plays the reference WAL's
  * role (`core/pipeline.go:266-335`) — a restarted query resumes from
  * the committed offset, processes only new input, and the DB ends in
  * the canonical state with no duplicates.
  */
class CheckpointRestartSpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint: no reprocessing, canonical final state") {
    val srcDir = Files.createTempDirectory("graft_src").toString
    val ckpt = Files.createTempDirectory("graft_ckpt2").toString
    val dbDir = Files.createTempDirectory("graft_db2").toString

    val db = SummaryDB.open(spark, dbDir)
    db.newStream(StreamMeta.exponential(9L, 2.0))

    def writeBatch(from: Int, until: Int): Unit =
      (from until until).map(i => Event(9L, i.toLong, i.toLong, i.toDouble)).toDS()
        .coalesce(1).write.mode("append").parquet(srcDir)

    def startQuery() = StreamingIngest.start(
      spark.readStream.schema(Encoders.product[Event].schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir).as[Event],
      db, ckpt)

    // Session 1: two source files.
    writeBatch(0, 40)
    writeBatch(40, 70)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterS1 = db.query(9L, "count", 0, 69, QueryParams())
    assert(afterS1.value == 70.0 && afterS1.error == 0.0)

    // Session 2: new file lands while "down"; restart from checkpoint.
    writeBatch(70, 100)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    // No duplicates (count exactly 100), canonical decay at N=100.
    val c = db.query(9L, "count", 0, 99, QueryParams())
    assert(c.value == 100.0 && c.error == 0.0)
    val s = db.query(9L, "sum", 0, 99, QueryParams())
    assert(s.value == 4950.0 && s.error == 0.0)
    assert(db.summaryWindows.count() == 9)
  }

  test("restart with all four sketch kinds enabled: tables equal a crash-free twin") {
    import org.apache.spark.sql.functions._
    val srcDir = Files.createTempDirectory("graft_src4").toString
    val ckpt = Files.createTempDirectory("graft_ckpt4").toString
    val dbDir = Files.createTempDirectory("graft_db4").toString

    val db = SummaryDB.open(spark, dbDir)
    def enableAll(d: graft.core.SummaryDB): Unit = {
      d.enableDistinctSummaries()
      d.enableFreqSummaries()
      d.enableSampleSummaries(k = 8)
      d.enableQuantileSummaries()
    }
    enableAll(db)

    def mk(from: Int, until: Int) =
      (from until until).map(i => Event(4L, i.toLong, i.toLong, (i % 11).toDouble)).toDS()
    def writeBatch(from: Int, until: Int): Unit =
      mk(from, until).coalesce(1).write.mode("append").parquet(srcDir)
    def startQuery() = StreamingIngest.start(
      spark.readStream.schema(Encoders.product[Event].schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir).as[Event],
      db, ckpt)

    // Session 1 sees two files; a third lands while "down"; restart.
    writeBatch(0, 40); writeBatch(40, 70)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    writeBatch(70, 100)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    // Crash-free twin: the same three batches applied directly under
    // the same batch ids the streaming source assigns (one file per
    // trigger, discovery order = write order).
    val twin = SummaryDB.open(spark,
      Files.createTempDirectory("graft_db4t").toString)
    enableAll(twin)
    twin.appendOnce(0L, mk(0, 40))
    twin.appendOnce(1L, mk(40, 70))
    twin.appendOnce(2L, mk(70, 100))

    def dump(d: graft.core.SummaryDB): Seq[Seq[String]] = Seq(
      d.summaryWindows.toDF().select($"streamId", $"cs", $"ce", $"count", $"sum"),
      d.distinctSketches.select($"streamId", $"cs", $"ce",
        hll_sketch_estimate($"sketch").cast("long").as("est")),
      d.freqSketches.select($"streamId", $"cs", $"ce"),
      d.sampleWindows.select($"streamId", $"cs", $"ce", to_json($"sample")),
      d.quantileWindows.select($"streamId", $"cs", $"ce"))
      .map(_.collect().map(_.toString).sorted.toSeq)

    assert(dump(db) == dump(twin),
      "post-restart sketch tables must equal the crash-free twin's")
    // And the sketch query surfaces agree.
    assert(db.sampleEvents(4L, k = 8) == twin.sampleEvents(4L, k = 8))
    assert(db.rangeQuantiles(4L, Seq(0.5)) == twin.rangeQuantiles(4L, Seq(0.5)))
    assert(db.heavyHitters(4L, 3) == twin.heavyHitters(4L, 3))
  }
}
