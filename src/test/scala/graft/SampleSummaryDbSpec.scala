package graft

import graft.core._
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** SummaryDB integration for the windowed bottom-k sample table:
  * incremental appends == clean rebuild BIT-FOR-BIT (bottom-k is an
  * exact monoid, so even the sample contents must match, not just
  * hashes), mergeEvery cadence parity, and the driver-returning query
  * surface against a brute-force bottom-k.
  */
class SampleSummaryDbSpec extends SparkSpec {
  import spark.implicits._

  private def batch(lo: Long, hi: Long, sid: Long = 9L) = spark.range(lo, hi)
    .select(lit(sid).as("streamId"), $"id".as("seq"), ($"id" * 3).as("ts"),
      ($"id" % 7).cast("double").as("value")).as[Event]

  private def table(db: SummaryDB) = db.sampleWindows
    .select($"streamId", $"cs", $"ce", to_json($"sample").as("s"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    .sortBy(t => (t._1, t._2)).toSeq

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("incremental appends match a single-batch build bit-for-bit; query surface answers") {
    val incDir = tmp("graft_sample_inc")
    val oneDir = tmp("graft_sample_one")
    val inc = SummaryDB.open(spark, incDir)
    inc.enableSampleSummaries(k = 8)
    inc.appendOnce(0L, batch(0, 40))
    inc.appendOnce(1L, batch(40, 100))

    val one = SummaryDB.open(spark, oneDir)
    one.enableSampleSummaries(k = 8)
    one.appendOnce(0L, batch(0, 100))
    assert(table(inc) == table(one),
      "incrementally maintained sample table must equal the one-shot build")

    // Full-range sample == brute-force bottom-8 by (hashKey(seq), seq).
    val expect = spark.range(0, 100)
      .select($"id".as("seq"), ($"id" % 7).cast("double").as("value"),
        Sampling.hashKey("seq").as("hk"))
      .orderBy($"hk", $"seq").limit(8)
      .select($"seq", $"value").as[(Long, Double)].collect().toSeq
    assert(inc.sampleEvents(9L, k = 8) == expect)
  }

  test("deferred-merge cadence: state after the next merge equals always-merging") {
    val lazyDir = tmp("graft_sample_lazy")
    val eagerDir = tmp("graft_sample_eager")
    val lzy = SummaryDB.open(spark, lazyDir, mergeEvery = 3)
    lzy.enableSampleSummaries(k = 8)
    val eager = SummaryDB.open(spark, eagerDir)
    eager.enableSampleSummaries(k = 8)
    Seq((0L, 0L, 30L), (1L, 30L, 60L), (2L, 60L, 90L)).foreach { case (b, lo, hi) =>
      lzy.appendOnce(b, batch(lo, hi))
      eager.appendOnce(b, batch(lo, hi))
    }
    // Third append crossed the cadence: both tables are canonical now.
    assert(table(lzy) == table(eager))
    // And both answer the same sample regardless of the merge history.
    assert(lzy.sampleEvents(9L, k = 8) == eager.sampleEvents(9L, k = 8))
  }

  test("crash replay rebuilds the sample table instead of double-applying the batch") {
    val crashDir = tmp("graft_sample_replay")
    val db = SummaryDB.open(spark, crashDir)
    db.enableSampleSummaries(k = 8)
    db.appendOnce(0L, batch(0, 50))
    db.appendOnce(1L, batch(50, 120))
    // Crash window: batch 1's events and sample append are on disk but
    // its commit marker is not — redelivery must rebuild from the WAL,
    // not re-append (cs/ce bookkeeping would double-count and drift
    // the partition off the canonical decay).
    val marker = new java.io.File(s"$crashDir/commits/batch-1")
    assert(marker.delete(), "commit marker should exist before simulated crash")
    db.appendOnce(1L, batch(50, 120))

    val clean = SummaryDB.open(spark, tmp("graft_sample_clean"))
    clean.enableSampleSummaries(k = 8)
    clean.appendOnce(0L, batch(0, 50))
    clean.appendOnce(1L, batch(50, 120))
    assert(table(db) == table(clean),
      "replayed store's sample table must equal the crash-free store's (bit-for-bit)")
    assert(db.sampleEvents(9L, k = 8) == clean.sampleEvents(9L, k = 8))
  }
}
