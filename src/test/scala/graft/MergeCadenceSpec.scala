package graft

import graft.core.{Event, QueryParams, SummaryDB}
import org.apache.spark.sql.functions._

/** The mergeEvery persistence-cadence knob (reference windowsPerMerge):
  * deferred re-coarsening keeps fine windows on disk between merges,
  * queries stay exact throughout, and the post-merge state is identical
  * to always-merging.
  */
class MergeCadenceSpec extends SparkSpec {
  import spark.implicits._

  private def batch(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(lit(5L).as("streamId"), $"id".as("seq"), ($"id" * 2).as("ts"),
      lit(1.0).as("value"))
    .as[Event]

  test("deferred merges: lagged table is finer, exact, and converges on the merge batch") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_cadence1").toString
    val d3 = java.nio.file.Files.createTempDirectory("graft_cadence3").toString
    val every = SummaryDB.open(spark, d1)
    val lazy3 = SummaryDB.open(spark, d3, mergeEvery = 3)

    // Appends 1 and 2 are both below the cadence: fine windows
    // accumulate in the lazy store, no re-coarsening yet.
    for ((lo, hi) <- Seq((0L, 100L), (100L, 220L))) {
      every.append(batch(lo, hi))
      lazy3.append(batch(lo, hi))
    }
    val lagged = lazy3.summaryWindows.count()
    val canonical = every.summaryWindows.count()
    assert(lagged > canonical + 50,
      s"expected retained fine windows: lagged=$lagged canonical=$canonical")
    // Queries over the lagged (nested, finer) partition stay exact.
    val r = lazy3.query(5L, "count", 0L, 1000L, QueryParams())
    assert(r.value == 220.0 && r.error == 0.0)

    // Third incremental append triggers the merge: states converge.
    every.append(batch(220, 300))
    lazy3.append(batch(220, 300))
    val a = every.summaryWindows.collect().sortBy(w => (w.streamId, w.cs)).toSeq
    val b = lazy3.summaryWindows.collect().sortBy(w => (w.streamId, w.cs)).toSeq
    assert(a == b, "post-merge state must equal the always-merge state")
  }
}
