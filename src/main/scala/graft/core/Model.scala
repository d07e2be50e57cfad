package graft.core

import graft.windowing.{ExponentialWindowing, PowerWindowing, WindowingSpec}

/** Raw ingest element (reference `core/stream.go:104`: `(ts, value)`
  * appended to a stream). `seq` is the 0-based element rank within the
  * stream — the reference's `numElements` counter
  * (`/root/reference/core/pipeline.go:98`).
  */
final case class Event(streamId: Long, seq: Long, ts: Long, value: Double)

/** A decayed summary window (reference `core/summary_window.go:13-19` +
  * `core/data.go:5-21`): count span [cs, ce], time span [ts, te], and
  * the monoid aggregate state. `max` is -Double.MaxValue when empty,
  * matching the reference's init.
  */
final case class SummaryWindow(
    streamId: Long,
    ts: Long,
    te: Long,
    cs: Long,
    ce: Long,
    count: Double,
    sum: Double,
    max: Double,
    min: Double)

object SummaryWindow {
  /** Reference init: `core/data.go:15-21`. */
  val EmptyMax: Double = -Double.MaxValue
  val EmptyMin: Double = Double.MaxValue
}

/** One exact element inside a landmark window. */
final case class Landmark(ts: Long, value: Double)

/** An exact (non-decayed) window (reference `core/landmark_window.go:5-14`).
  * DRIVER-SIDE VIEW ONLY: one value holding every element of the window.
  * The persisted/query layout is [[LandmarkSpan]] + [[LandmarkElem]]
  * rows — a landmark left open across a billion-event stretch must not
  * materialize one multi-GB array value (Spark's ~2 GB single-value
  * ceiling); the reference stores elements verbatim but its LAYOUT is
  * ours to choose (SURVEY §1.5 "exact elements kept as rows").
  */
final case class LandmarkWindow(streamId: Long, ts: Long, te: Long, elems: Seq[Landmark])

/** A landmark window's declared span — one bounded row per declared
  * interval per stream (`windowId` = the interval's index, the join key
  * to its [[LandmarkElem]] rows). [ts, te] is the DECLARED interval,
  * as the reference stamps (`core/landmark_window.go:16-26`).
  */
final case class LandmarkSpan(streamId: Long, windowId: Long, ts: Long, te: Long)

/** One exact landmark element as a ROW keyed by (streamId, windowId) —
  * the scale-safe persisted layout: constant row width no matter how
  * long a landmark stays open.
  */
final case class LandmarkElem(streamId: Long, windowId: Long, ts: Long, value: Double)

/** Query-time digest of one landmark window restricted to [t0, t1] —
  * the ONLY landmark state the estimator consumes: the declared span
  * (for edge-window length/overlap subtraction) and the in-range
  * element aggregates (exact count/sum/max/min contribution). Computed
  * distributively from [[LandmarkElem]] rows; O(#intervals) digests
  * flow to the estimator instead of O(#elements) values.
  */
final case class LandmarkDigest(
    streamId: Long,
    ts: Long,
    te: Long,
    cnt: Long,
    sum: Double,
    vmax: Double,
    vmin: Double)

object LandmarkDigest {
  /** Digest a driver-side [[LandmarkWindow]] (legacy/test path). */
  def of(lw: LandmarkWindow, t0: Long, t1: Long): LandmarkDigest = {
    var cnt = 0L; var sum = 0.0
    var vmax = SummaryWindow.EmptyMax; var vmin = SummaryWindow.EmptyMin
    lw.elems.foreach { e =>
      if (t0 <= e.ts && e.ts <= t1) {
        cnt += 1; sum += e.value
        if (e.value > vmax) vmax = e.value
        if (e.value < vmin) vmin = e.value
      }
    }
    LandmarkDigest(lw.streamId, lw.ts, lw.te, cnt, sum, vmax, vmin)
  }
}

/** Query parameters (reference `core/op.go:5-8`). */
final case class QueryParams(confidenceLevel: Double = 0.95, sdMultiplier: Double = 1.0)

/** Query result: estimate + error = CI width (reference `core/op.go:10-13`). */
final case class AggResult(value: Double, error: Double)

/** Per-stream catalog row: which operators and which decay policy a
  * stream was declared with (reference `protos/summarydb.capnp:47-54`).
  */
final case class StreamMeta(
    streamId: Long,
    operators: Seq[String],
    windowKind: String, // "exp" | "power"
    base: Double,
    p: Long,
    q: Long,
    r: Long,
    s: Long) {
  def spec: WindowingSpec = windowKind match {
    case "exp"   => ExponentialWindowing(base)
    case "power" => PowerWindowing(p, q, r, s)
    case other   => throw new IllegalArgumentException(s"unknown windowing kind: $other")
  }
}

object StreamMeta {
  def exponential(streamId: Long, base: Double, operators: Seq[String] = Seq("count", "sum", "max", "min")): StreamMeta =
    StreamMeta(streamId, operators, "exp", base, 0, 0, 0, 0)
  def power(streamId: Long, p: Long, q: Long, r: Long, s: Long, operators: Seq[String] = Seq("count", "sum", "max", "min")): StreamMeta =
    StreamMeta(streamId, operators, "power", 0.0, p, q, r, s)
}
