package graft

import graft.core._
import org.apache.spark.sql.functions._

/** SummaryDB integration for the windowed quantile sketch table — the
  * fourth sketch kind gains the same maintenance contract as
  * distinct/freq/sample: incremental appends land on the canonical
  * partition, deferred-merge cadence converges, crash replay rebuilds
  * from the WAL instead of double-applying, and the driver-returning
  * query surface answers exactly when windows are below sketch
  * capacity.
  */
class QuantileSummaryDbSpec extends SparkSpec {
  import spark.implicits._

  private def batch(lo: Long, hi: Long, sid: Long = 9L) = spark.range(lo, hi)
    .select(lit(sid).as("streamId"), $"id".as("seq"), ($"id" * 3).as("ts"),
      ($"id" % 101).cast("double").as("value")).as[Event]

  /** Partition + probed estimates: the canonical observable (sketch
    * BYTES can differ by fill order; the partition and the answers at
    * below-capacity windows cannot).
    */
  private def state(db: SummaryDB) = {
    val part = db.quantileWindows
      .select($"streamId", $"cs", $"ce")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    (part, db.rangeQuantiles(9L, Seq(0.25, 0.5, 0.75, 0.99)))
  }

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("incremental appends match a single-batch build; answers exact below capacity") {
    val inc = SummaryDB.open(spark, tmp("graft_q_inc"))
    inc.enableQuantileSummaries()
    inc.appendOnce(0L, batch(0, 40))
    inc.appendOnce(1L, batch(40, 100))

    val one = SummaryDB.open(spark, tmp("graft_q_one"))
    one.enableQuantileSummaries()
    one.appendOnce(0L, batch(0, 100))
    assert(state(inc) == state(one),
      "incrementally maintained quantile table must equal the one-shot build")

    // Below capacity (100 < K=512) every window is exact: rank_err 0,
    // and the p-quantile is the exact order statistic of the values.
    val qs = inc.rangeQuantiles(9L, Seq(0.5))
    assert(qs.size == 1)
    val (p, est, err, n) = qs.head
    assert(p == 0.5 && err == 0L && n == 100L)
    val exact = (0 until 100).map(i => (i % 101).toDouble).sorted.apply(49)
    assert(est == exact, s"p50 est=$est exact=$exact")
  }

  test("deferred-merge cadence: state after the next merge equals always-merging") {
    val lzy = SummaryDB.open(spark, tmp("graft_q_lazy"), mergeEvery = 3)
    lzy.enableQuantileSummaries()
    val eager = SummaryDB.open(spark, tmp("graft_q_eager"))
    eager.enableQuantileSummaries()
    Seq((0L, 0L, 30L), (1L, 30L, 60L), (2L, 60L, 90L)).foreach { case (b, lo, hi) =>
      lzy.appendOnce(b, batch(lo, hi))
      eager.appendOnce(b, batch(lo, hi))
    }
    assert(state(lzy) == state(eager))
  }

  test("crash replay rebuilds the quantile table instead of double-applying the batch") {
    val crashDir = tmp("graft_q_replay")
    val db = SummaryDB.open(spark, crashDir)
    db.enableQuantileSummaries()
    db.appendOnce(0L, batch(0, 50))
    db.appendOnce(1L, batch(50, 120))
    // Crash window: batch 1's events and sketch append are on disk but
    // its commit marker is not — redelivery must rebuild from the WAL
    // (double-application would double sketch weights AND drift cs/ce).
    val marker = new java.io.File(s"$crashDir/commits/batch-1")
    assert(marker.delete(), "commit marker should exist before simulated crash")
    db.appendOnce(1L, batch(50, 120))

    val clean = SummaryDB.open(spark, tmp("graft_q_clean"))
    clean.enableQuantileSummaries()
    clean.appendOnce(0L, batch(0, 50))
    clean.appendOnce(1L, batch(50, 120))
    assert(state(db) == state(clean),
      "replayed store's quantile state must equal the crash-free store's")
    // n must be the true element count (the loudest double-apply tell).
    assert(db.rangeQuantiles(9L, Seq(0.5)).head._4 == 120L)
  }
}
