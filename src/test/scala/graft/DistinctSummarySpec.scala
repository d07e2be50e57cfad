package graft

import graft.core._
import graft.windowing.ExponentialWindowing
import org.apache.spark.sql.functions._

class DistinctSummarySpec extends SparkSpec {
  import spark.implicits._

  private val exp2 = ExponentialWindowing(2.0)

  private def stream(values: Seq[Double], sid: Long = 7L) =
    spark.createDataset(values.zipWithIndex.map { case (v, i) =>
      Event(sid, i.toLong, i.toLong * 10, v)
    })

  test("windowed sketches merge to the exact distinct count at small cardinality") {
    val values = Seq(1.0, 2.0, 3.0, 1.0, 2.0, 4.0, 5.0, 1.0, 6.0, 7.0, 2.0, 8.0)
    val sk = DistinctSummary.summarize(stream(values), exp2)
    // windows follow the canonical decay partition of n=12
    val expectedWindows = graft.windowing.DecayModel.windowStarts(exp2, values.size.toLong).length
    assert(sk.count() == expectedWindows)
    val est = DistinctSummary.rangeDistinct(sk).collect().head.getAs[Long]("approx_distinct")
    assert(est == values.distinct.size.toLong,
      s"HLL is exact in sparse mode: est=$est exact=${values.distinct.size}")
  }

  test("range filter prunes windows; whole-stream union sees every element") {
    val values = (1 to 64).map(_.toDouble)
    val sk = DistinctSummary.summarize(stream(values), exp2).persist()
    val all = DistinctSummary.rangeDistinct(sk).collect().head.getAs[Long]("approx_distinct")
    assert(math.abs(all - 64.0) <= 64.0 * 0.05)
    // a prefix time range touches fewer windows
    val some = DistinctSummary.rangeDistinct(sk, t0 = 0L, t1 = 100L)
      .collect().head.getAs[Long]("approx_distinct")
    assert(some <= all)
    sk.unpersist()
  }

  test("recoarsenDistinct: per-element sketches re-merge to the canonical partition") {
    val values = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0)
    val events = stream(values)
    val fine = events.toDF()
      .groupBy($"streamId", $"seq")
      .agg(min($"ts").as("ts"), max($"ts").as("te"),
        min($"seq").as("cs"), max($"seq").as("ce"),
        hll_sketch_agg($"value".cast("string"), lit(12)).as("sketch"))
      .drop("seq")
    val localSpec = ExponentialWindowing(2.0) // local: the closure must not drag the suite in
    val re = Compactor.recoarsenDistinct(fine, _ => localSpec)
      .withColumn("est", hll_sketch_estimate($"sketch").cast("long"))
      .select($"cs", $"ce", $"est").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = DistinctSummary.summarize(events, exp2)
      .withColumn("est", hll_sketch_estimate($"sketch").cast("long"))
      .select($"cs", $"ce", $"est").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == direct, s"recoarsened $re != direct $direct")
  }

  test("buffered mode follows the buffered decay partition") {
    val values = (1 to 40).map(_.toDouble)
    val sk = DistinctSummary.summarize(stream(values), exp2, bufferSize = 8L)
    val starts = graft.windowing.DecayModel.windowStarts(exp2, 40L, bufferSize = 8L)
    val got = sk.select($"cs").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == starts.toSeq, s"got ${got.toSeq} want ${starts.toSeq}")
    val est = DistinctSummary.rangeDistinct(sk).collect().head.getAs[Long]("approx_distinct")
    assert(est == 40L)
  }

  test("contract holds on the real events table") {
    val events = Ingest.fromEventsTable(spark, "/root/testdata/sf0.001")
    val rows = DistinctSummary.distinctContract(events, exp2).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      "merged window sketches drifted beyond tolerance")
  }

  test("crash replay rebuilds the sketch table instead of double-applying the batch") {
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(lit(9L).as("streamId"), $"id".as("seq"), ($"id" * 3).as("ts"),
        ($"id" % 7).cast("double").as("value")).as[Event]
    def partition(db: SummaryDB) = db.distinctSketches
      .select($"streamId", $"cs", $"ce",
        hll_sketch_estimate($"sketch").cast("long").as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    val crashDir = java.nio.file.Files.createTempDirectory("graft_dreplay").toString
    val cleanDir = java.nio.file.Files.createTempDirectory("graft_dclean").toString
    val db = SummaryDB.open(spark, crashDir)
    db.enableDistinctSummaries()
    db.appendOnce(0L, batch(0, 50))
    db.appendOnce(1L, batch(50, 120))
    // Simulate the crash window: batch 1's events and sketch append are
    // on disk but its commit marker is not — a checkpoint restart will
    // re-deliver batch 1, and the replay must NOT re-apply it to the
    // already-updated sketch table.
    val marker = new java.io.File(s"$crashDir/commits/batch-1")
    assert(marker.delete(), "commit marker should exist before simulated crash")
    db.appendOnce(1L, batch(50, 120))

    val clean = SummaryDB.open(spark, cleanDir)
    clean.enableDistinctSummaries()
    clean.appendOnce(0L, batch(0, 50))
    clean.appendOnce(1L, batch(50, 120))
    assert(partition(db) == partition(clean),
      "replayed store's sketch partition must equal the crash-free store's")
  }
}
