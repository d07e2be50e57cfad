package graft

import graft.core._
import graft.windowing.{DecayModel, ExponentialWindowing}

/** Mirrors the reference suites that exercise window-state bookkeeping,
  * which our architecture replaces with plain Datasets + pushed-down
  * range predicates:
  *
  *  - `/root/reference/core/stream_window_manager_test.go:8-52`
  *    (insert/range/delete over summary + landmark windows)
  *  - `/root/reference/storage/query_index_test.go:8-27`
  *    (overlapping-window selection)
  *  - `/root/reference/core/ingestor_test.go:8-33`
  *    (appends chunk into full buffers in arrival order)
  *  - `/root/reference/core/max_op_test.go:9-31`
  *    (max Apply/Merge through the monoid re-merge)
  */
class StreamWindowManagerMirrorSuite extends SparkSpec {
  import spark.implicits._

  private def sw(ts: Long, te: Long, cs: Long, ce: Long, v: Double) =
    SummaryWindow(0L, ts, te, cs, ce, count = ce - cs + 1, sum = v, max = v, min = v)

  test("stream_window_manager_test.go: range selection and deletion counts") {
    // Five summary windows [i*5, (i+1)*5-1], as the reference builds.
    var summary = spark.createDataset((0L until 5L).map(i => sw(i * 5, (i + 1) * 5 - 1, i, i, i.toDouble)))
    // Three landmark windows [3i, 3i+2] with one element at 3i+1.
    var landmarks = spark.createDataset((0L until 3L).map(i =>
      LandmarkWindow(0L, 3 * i, 3 * i + 2, Seq(Landmark(3 * i + 1, i.toDouble)))))
    assert(summary.count() == 5 && landmarks.count() == 3)

    // GetSummaryWindowInRange(6, 16): same overlap predicate the query
    // path pushes down (te >= t0 && ts <= t1).
    val mid = summary.filter($"te" >= 6L && $"ts" <= 16L).collect()
    assert(mid.length == 3)
    assert(mid.forall(w => w.te > 5 && w.te < 20)) // the reference's own post-assertions

    // DeleteSummaryWindow(middle) -> 2 remain.
    val midStarts = mid.map(_.ts).toSet
    summary = summary.filter(w => !midStarts.contains(w.ts))
    assert(summary.count() == 2)

    // GetLandmarkWindowInRange(1, 3) -> 2; delete them -> 1 remains.
    val lmMid = landmarks.filter($"te" >= 1L && $"ts" <= 3L).collect()
    assert(lmMid.length == 2)
    val lmStarts = lmMid.map(_.ts).toSet
    landmarks = landmarks.filter(w => !lmStarts.contains(w.ts))
    assert(landmarks.count() == 1)
  }

  test("query_index_test.go: overlapping start selection via explicit (ts,te) spans") {
    // The reference stores only window STARTS {0,5,10,15,20} and
    // over-fetches [floor(t0), ceiling(t1)]; our windows carry te
    // explicitly so the predicate is exact. With end = next_start the
    // reference's [8,15] -> {5,10,15} is exactly the overlap answer.
    def windowsFrom(starts: Seq[Long]): Seq[(Long, Long)] =
      starts.sorted.zip(starts.sorted.tail.map(_ - 1) :+ Long.MaxValue)
    val w1 = windowsFrom(Seq(0L, 5L, 10L, 15L, 20L))
    assert(w1.filter { case (s, e) => e >= 8 && s <= 15 }.map(_._1) == Seq(5L, 10L, 15L))
    // Remove(15): window 10's span grows to [10,19], still overlapping
    // [5,15]. (The reference returns {5,10,20} here — it over-fetches
    // the ceiling start 20 and lets the estimator prorate it away;
    // exact spans make the over-fetch unnecessary, so 20 is correctly
    // absent.)
    val w2 = windowsFrom(Seq(0L, 5L, 10L, 20L))
    assert(w2.filter { case (s, e) => e >= 5 && s <= 15 }.map(_._1) == Seq(5L, 10L))
  }

  test("ingestor_test.go: appends chunk into full-capacity cuts in arrival order") {
    // 20 appends through a buffer: full buffers cut at exactly capacity
    // elements each, in order, tail flushed after (the reference sees 2
    // full capacity-10 buffers; capacity here derives from the spec).
    val spec = ExponentialWindowing(2.0)
    val lengths = spec.newWindowing().windowsCoveringUpto(10L)
    val capacity = lengths.sum
    val n = 2 * capacity + 3
    val sizes = DecayModel.sessionSizes(spec, n, bufferSize = 10L).toSeq
    assert(sizes.sum == n, "chunking must preserve every element")
    // First two chunks are the full-buffer cut (largest-first), each
    // summing to exactly `capacity`.
    val cut = lengths.reverse
    assert(sizes.take(cut.length) == cut)
    assert(sizes.slice(cut.length, 2 * cut.length) == cut)
    // Tail: a partial descending cut plus size-1 flush events.
    val tail = sizes.drop(2 * cut.length)
    assert(tail.sum == 3)
  }

  test("max_op_test.go: merge of five windows is their max; empty init loses to any value") {
    // Five single-element windows, values 0..4 (the reference's Merge
    // loop), re-coarsened to the canonical partition for n=5.
    val fine = spark.createDataset((0L until 5L).map(i => sw(i, i, i, i, i.toDouble)))
    val merged = Compactor.recoarsen(fine, _ => ExponentialWindowing(2.0)).collect()
    assert(merged.map(_.max).max == 4.0) // Merge: max{0..4} = 4
    assert(merged.map(w => (w.cs, w.ce)).sorted.head._1 == 0L)
    // Apply on empty state: anything beats the -MaxValue init.
    assert(math.max(SummaryWindow.EmptyMax, 5.0) == 5.0)
  }
}
