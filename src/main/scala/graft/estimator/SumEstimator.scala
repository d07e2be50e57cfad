package graft.estimator

import graft.core.{AggResult, LandmarkWindow, QueryParams, SummaryWindow}

/** Query-time estimation over the windows overlapping [t0, t1].
  *
  * Semantics mirror the reference's shared count/sum kernel
  * (`/root/reference/core/sum_estimator.go:34-118`): windows fully
  * inside the range contribute exactly; the two edge windows contribute
  * under a uniformity assumption (mean = sum * overlap/length,
  * variance = sum * ratio * (1 - ratio)); time spans covered by landmark
  * windows are subtracted from the edge windows' length/overlap and the
  * landmark elements in range are added exactly.
  *
  * This is pure arithmetic over the O(log N) overlapping windows of one
  * stream; at scale it runs inside `mapGroups` on executors, one group
  * per stream.
  */
object SumEstimator {

  private final class WindowInfo {
    var start = 0L
    var end = 0L
    var sum = 0.0
    var overlap = 1L
    var length = 1L

    def setValues(w: SummaryWindow, value: Double): Unit = { start = w.ts; end = w.te; sum = value }
    def setLengthAndOverlap(t0: Long, t1: Long): Unit = {
      overlap = StatsUtil.windowOverlap(start, end, t0, t1)
      length = StatsUtil.windowLength(start, end)
    }
  }

  private def updateEstimate(info: WindowInfo, b: Array[Double], s: Array[Double]): Unit = {
    b(1) += info.sum
    if (info.overlap == info.length) b(0) += info.sum
    if (info.overlap > 0) {
      val ratio = info.overlap.toDouble / info.length.toDouble
      s(0) += info.sum * ratio
      s(1) += info.sum * ratio * (1 - ratio)
    }
  }

  /** `summaryWindows` must be exactly the windows overlapping [t0, t1],
    * in time order; `landmarkWindows` those with te >= t0 (and ts within
    * the index probe range), in time order.
    */
  def sumStats(
      t0: Long,
      t1: Long,
      summaryWindows: Seq[SummaryWindow],
      landmarkWindows: Seq[LandmarkWindow],
      getSummaryData: SummaryWindow => Double,
      getLandmarkData: Double => Double): (Bounds, MeanVar) = {
    val first = new WindowInfo
    val last = new WindowInfo
    val middle = new WindowInfo
    val landmark = new WindowInfo

    val n = summaryWindows.size
    var totalSum = 0.0
    var i = 0
    summaryWindows.foreach { w =>
      val value = getSummaryData(w)
      if (i == 0) first.setValues(w, value)
      if (i == n - 1) last.setValues(w, value)
      totalSum += value
      i += 1
    }
    if (n == 1) last.sum = 0 // single window: no distinct right edge
    middle.sum = totalSum - (first.sum + last.sum)

    first.setLengthAndOverlap(t0, t1)
    last.setLengthAndOverlap(t0, t1)

    landmarkWindows.foreach { lw =>
      if (first.start < lw.te) {
        first.length -= StatsUtil.windowOverlap(lw.ts, lw.te, first.start, first.end)
        first.overlap -= StatsUtil.windowOverlap(lw.ts, lw.te, t0, first.end)
      }
      if (last.end > lw.ts) {
        last.length -= StatsUtil.windowOverlap(lw.ts, lw.te, last.start, last.end)
        last.overlap -= StatsUtil.windowOverlap(lw.ts, lw.te, last.start, t1)
      }
      lw.elems.foreach { lm =>
        if (t0 <= lm.ts && lm.ts <= t1) landmark.sum += getLandmarkData(lm.value)
      }
    }

    val b = Array(0.0, 0.0) // lower, upper
    val s = Array(0.0, 0.0) // mean, var
    updateEstimate(landmark, b, s)
    updateEstimate(first, b, s)
    updateEstimate(middle, b, s)
    updateEstimate(last, b, s)
    (Bounds(b(0), b(1)), MeanVar(s(0), s(1)))
  }

  private def ciQuery(
      t0: Long,
      t1: Long,
      sw: Seq[SummaryWindow],
      lw: Seq[LandmarkWindow],
      params: QueryParams,
      getSummaryData: SummaryWindow => Double,
      getLandmarkData: Double => Double): AggResult = {
    val (bounds, mv) = sumStats(t0, t1, sw, lw, getSummaryData, getLandmarkData)
    val ci = StatsUtil.toCI(bounds, mv, params.sdMultiplier, params.confidenceLevel)
    AggResult(ci.mean, ci.width)
  }

  /** count over [t0, t1] (reference `core/count_op.go:39-67`). */
  def countQuery(
      t0: Long, t1: Long, sw: Seq[SummaryWindow], lw: Seq[LandmarkWindow], params: QueryParams): AggResult =
    ciQuery(t0, t1, sw, lw, params, _.count, _ => 1.0)

  /** sum over [t0, t1] (reference `core/sum_op.go:40-68`). */
  def sumQuery(
      t0: Long, t1: Long, sw: Seq[SummaryWindow], lw: Seq[LandmarkWindow], params: QueryParams): AggResult =
    ciQuery(t0, t1, sw, lw, params, _.sum, identity)

  /** max over [t0, t1]: upper-biased merge of overlapping windows; error
    * drops to 0 only if a landmark element in range is seen (reference
    * `core/max_op.go:32-63`). Not statistical.
    */
  def maxQuery(
      t0: Long, t1: Long, sw: Seq[SummaryWindow], lw: Seq[LandmarkWindow]): AggResult = {
    var value = SummaryWindow.EmptyMax
    sw.foreach(w => value = math.max(value, w.max))
    var error = 1.0
    lw.foreach(_.elems.foreach { lm =>
      if (lm.ts >= t0 && lm.ts <= t1) {
        value = math.max(value, lm.value)
        error = 0.0
      }
    })
    AggResult(value, error)
  }

  /** min over [t0, t1]: advertised in the reference README but absent
    * from its code (`README.md:23` vs `core/data.go:9-13`); implemented
    * here as the dual of max (SURVEY §7.3).
    */
  def minQuery(
      t0: Long, t1: Long, sw: Seq[SummaryWindow], lw: Seq[LandmarkWindow]): AggResult = {
    var value = SummaryWindow.EmptyMin
    sw.foreach(w => value = math.min(value, w.min))
    var error = 1.0
    lw.foreach(_.elems.foreach { lm =>
      if (lm.ts >= t0 && lm.ts <= t1) {
        value = math.min(value, lm.value)
        error = 0.0
      }
    })
    AggResult(value, error)
  }

  /** Hard deterministic bounds on a count/sum range answer: lower = the
    * fully-covered windows plus landmark elements in range, upper = all
    * overlapping windows (the b-accumulators of [[sumStats]], mirroring
    * `/root/reference/core/sum_estimator.go:96-101`). For non-negative
    * contributions the exact answer always lies within — count
    * contributions are 1 per element, so count bounds are
    * unconditional; sum bounds require non-negative values.
    */
  def boundsQuery(
      op: String, t0: Long, t1: Long, sw: Seq[SummaryWindow], lw: Seq[LandmarkWindow]): Bounds =
    op match {
      case "count" => sumStats(t0, t1, sw, lw, _.count, _ => 1.0)._1
      case "sum"   => sumStats(t0, t1, sw, lw, _.sum, identity)._1
      case other   => throw new IllegalArgumentException(s"no hard bounds for operator: $other")
    }

  /** Dispatch by operator name, as the reference's OpSet does
    * (`/root/reference/core/op_set.go:14-18`).
    */
  def query(
      op: String,
      t0: Long,
      t1: Long,
      sw: Seq[SummaryWindow],
      lw: Seq[LandmarkWindow],
      params: QueryParams): AggResult = op match {
    case "count" => countQuery(t0, t1, sw, lw, params)
    case "sum"   => sumQuery(t0, t1, sw, lw, params)
    case "max"   => maxQuery(t0, t1, sw, lw)
    case "min"   => minQuery(t0, t1, sw, lw)
    case other   => throw new IllegalArgumentException(s"unknown operator: $other")
  }
}
