package graft

import graft.core._
import org.apache.spark.sql.functions._

/** SummaryDB integration for the windowed bloom/cms table: incremental
  * appends == clean rebuild (bit-for-bit — both sketch unions are
  * order-independent), mergeEvery cadence parity, crash-replay rebuild,
  * and the driver-returning query surface.
  */
class FreqSummaryDbSpec extends SparkSpec {
  import spark.implicits._

  private def batch(lo: Long, hi: Long, sid: Long = 9L) = spark.range(lo, hi)
    .select(lit(sid).as("streamId"), $"id".as("seq"), ($"id" * 3).as("ts"),
      ($"id" % 7).cast("double").as("value")).as[Event]

  private def partition(db: SummaryDB) = db.freqSketches
    .select($"streamId", $"cs", $"ce",
      xxhash64($"bloom").as("hb"), xxhash64($"cms").as("hc"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    .sortBy(t => (t._1, t._2)).toSeq

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("incremental appends match a single-batch build, and the query surface answers") {
    val incDir = tmp("graft_freq_inc")
    val oneDir = tmp("graft_freq_one")
    val inc = SummaryDB.open(spark, incDir)
    inc.enableFreqSummaries()
    inc.appendOnce(0L, batch(0, 40))
    inc.appendOnce(1L, batch(40, 100))

    val one = SummaryDB.open(spark, oneDir)
    one.enableFreqSummaries()
    one.appendOnce(0L, batch(0, 100))
    assert(partition(inc) == partition(one),
      "incrementally maintained sketch table must equal the one-shot build")

    // values are id % 7 in [0, 7): every residue present, 9.0 absent.
    (0 until 7).foreach(v =>
      assert(inc.mightContain(9L, s"$v.0"), s"present value $v.0 must probe true"))
    assert(!inc.mightContain(9L, "9.0"))
    // CMS estimate is exact here (7 keys, 200-wide rows): residues of
    // 0..99 mod 7 — residues 0 and 1 appear 15 times, the rest 14.
    assert(inc.freqEstimate(9L, "1.0") == 15L)
    assert(inc.freqEstimate(9L, "6.0") == 14L)
    assert(inc.freqEstimate(9L, "9.0") == 0L)
    // heavy hitters through the maintained table: residues 0 and 1
    // lead (15 each), ties broken by key asc.
    assert(inc.heavyHitters(9L, 2) == Seq(("0.0", 15L), ("1.0", 15L)))
  }

  test("deferred-merge cadence: state after the next merge equals always-merging") {
    val lazyDir = tmp("graft_freq_lazy")
    val eagerDir = tmp("graft_freq_eager")
    // mergeEvery=3: appends 1 and 2 keep fine windows, append 3 merges.
    val lzy = SummaryDB.open(spark, lazyDir, mergeEvery = 3)
    lzy.enableFreqSummaries()
    val eager = SummaryDB.open(spark, eagerDir)
    eager.enableFreqSummaries()
    Seq((0L, 30L), (30L, 55L), (55L, 90L)).zipWithIndex.foreach { case ((lo, hi), i) =>
      lzy.appendOnce(i.toLong, batch(lo, hi))
      eager.appendOnce(i.toLong, batch(lo, hi))
    }
    assert(partition(lzy) == partition(eager),
      "deferred-merge sketch state after the merge append must equal always-merge")
  }

  test("crash replay rebuilds the sketch table instead of double-applying the batch") {
    val crashDir = tmp("graft_freq_replay")
    val cleanDir = tmp("graft_freq_clean")
    val db = SummaryDB.open(spark, crashDir)
    db.enableFreqSummaries()
    db.appendOnce(0L, batch(0, 50))
    db.appendOnce(1L, batch(50, 120))
    // batch 1's events and sketch append are on disk, its commit marker
    // is not — the replayed delivery must rebuild, not re-append.
    val marker = new java.io.File(s"$crashDir/commits/batch-1")
    assert(marker.delete(), "commit marker should exist before simulated crash")
    db.appendOnce(1L, batch(50, 120))

    val clean = SummaryDB.open(spark, cleanDir)
    clean.enableFreqSummaries()
    clean.appendOnce(0L, batch(0, 50))
    clean.appendOnce(1L, batch(50, 120))
    assert(partition(db) == partition(clean),
      "replayed store's sketch partition must equal the crash-free store's")
  }
}
