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

/** An exact (non-decayed) window (reference `core/landmark_window.go:5-14`). */
final case class LandmarkWindow(streamId: Long, ts: Long, te: Long, elems: Seq[Landmark])

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
