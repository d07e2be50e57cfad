package graft.core

import graft.estimator.SumEstimator
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed range-query execution over the summary + landmark tables.
  *
  * The reference answers one stream at a time on a single node
  * (`/root/reference/core/stream.go:156-192`): probe the time index for
  * overlapping windows, then run the op's estimator. Here the probe is a
  * pushed-down range filter (`te >= t0 && ts <= t1` — exactly the
  * index-probe-plus-edge-filter of
  * `/root/reference/storage/query_index.go:48-74` +
  * `/root/reference/core/stream_window_manager.go:78-93`), and the
  * estimator runs per stream inside `cogroup` on executors — every
  * stream in parallel, O(log N) window rows each, nothing collected to
  * the driver.
  *
  * Landmark state enters as [[LandmarkSpan]] + [[LandmarkElem]] ROWS:
  * [[landmarkDigests]] folds the in-range elements of each window into
  * one bounded [[LandmarkDigest]] row by a distributed aggregation, so
  * the estimator sees O(#intervals) digests per stream no matter how
  * many exact elements a landmark holds — no per-window element array
  * ever materializes. The `Dataset[LandmarkWindow]` overloads (driver
  * -side view, golden tests) remain and digest inside the cogroup.
  */
object QueryEngine {

  /** Per-window landmark digests for [t0, t1]: the declared spans
    * overlapping the range, each with its in-range element aggregates
    * (zero-element spans still subtract from edge windows, hence the
    * left join). One aggregation over the element rows + one join
    * against the bounded span table; output is O(#intervals) rows.
    */
  def landmarkDigests(
      spans: Dataset[LandmarkSpan],
      elems: Dataset[LandmarkElem],
      t0: Long,
      t1: Long): Dataset[LandmarkDigest] = {
    val spark = spans.sparkSession
    import spark.implicits._
    val sp = spans.filter($"te" >= t0 && $"ts" <= t1).toDF()
    val ag = elems.filter($"ts" >= t0 && $"ts" <= t1)
      .groupBy($"streamId", $"windowId")
      .agg(
        count(lit(1)).as("cnt"),
        sum($"value").as("sum"),
        max($"value").as("vmax"),
        min($"value").as("vmin"))
    sp.join(ag, Seq("streamId", "windowId"), "left")
      .select($"streamId", $"ts", $"te",
        coalesce($"cnt", lit(0L)).as("cnt"),
        coalesce($"sum", lit(0.0)).as("sum"),
        coalesce($"vmax", lit(SummaryWindow.EmptyMax)).as("vmax"),
        coalesce($"vmin", lit(SummaryWindow.EmptyMin)).as("vmin"))
      .as[LandmarkDigest]
  }

  /** Estimate `op` over [t0, t1] for every stream, over the row-layout
    * landmark tables. Output: (stream_id, estimate, ci_width). Streams
    * with no overlapping summary or landmark windows produce no row.
    */
  def rangeQueryAll(
      sw: Dataset[SummaryWindow],
      spans: Dataset[LandmarkSpan],
      elems: Dataset[LandmarkElem],
      op: String,
      t0: Long,
      t1: Long,
      params: QueryParams): DataFrame = {
    val spark = sw.sparkSession
    import spark.implicits._
    val swF = sw.filter($"te" >= t0 && $"ts" <= t1)
    swF
      .groupByKey(_.streamId)
      .cogroup(landmarkDigests(spans, elems, t0, t1).groupByKey(_.streamId)) { (sid, sws, lds) =>
        val s = sws.toArray.sortBy(_.ts).toSeq
        val l = lds.toArray.sortBy(_.ts).toSeq
        if (s.isEmpty && l.isEmpty) Iterator.empty
        else {
          val r = SumEstimator.queryDigest(op, t0, t1, s, l, params)
          Iterator((sid, r.value, r.error))
        }
      }
      .toDF("stream_id", "estimate", "ci_width")
  }

  /** [[rangeQueryAll]] over the driver-side landmark view (golden tests
    * and empty-landmark callers); digests in-executor.
    */
  def rangeQueryAll(
      sw: Dataset[SummaryWindow],
      lw: Dataset[LandmarkWindow],
      op: String,
      t0: Long,
      t1: Long,
      params: QueryParams = QueryParams()): DataFrame = {
    val spark = sw.sparkSession
    import spark.implicits._

    val swF = sw.filter($"te" >= t0 && $"ts" <= t1)
    val lwF = lw.filter($"te" >= t0 && $"ts" <= t1)

    swF
      .groupByKey(_.streamId)
      .cogroup(lwF.groupByKey(_.streamId)) { (sid, sws, lws) =>
        val s = sws.toArray.sortBy(_.ts).toSeq
        val l = lws.toArray.sortBy(_.ts).toSeq
        if (s.isEmpty && l.isEmpty) Iterator.empty
        else {
          val r = SumEstimator.query(op, t0, t1, s, l, params)
          Iterator((sid, r.value, r.error))
        }
      }
      .toDF("stream_id", "estimate", "ci_width")
  }

  /** As [[rangeQueryAll]] for SEVERAL ops in one pass: a single
    * cogroup walks each stream's windows once and emits every requested
    * estimate — (stream_id, estimates[i] for ops[i]). Used by the
    * approximate query rewrite so count+sum cost one shuffle, not two.
    */
  def rangeQueryMultiAll(
      sw: Dataset[SummaryWindow],
      lw: Dataset[LandmarkWindow],
      ops: Seq[String],
      t0: Long,
      t1: Long,
      params: QueryParams = QueryParams()): DataFrame = {
    val spark = sw.sparkSession
    import spark.implicits._
    val opList = ops.toList
    val swF = sw.filter($"te" >= t0 && $"ts" <= t1)
    val lwF = lw.filter($"te" >= t0 && $"ts" <= t1)
    swF
      .groupByKey(_.streamId)
      .cogroup(lwF.groupByKey(_.streamId)) { (sid, sws, lws) =>
        val s = sws.toArray.sortBy(_.ts).toSeq
        val l = lws.toArray.sortBy(_.ts).toSeq
        if (s.isEmpty && l.isEmpty) Iterator.empty
        else {
          // count_hi rides along: the hard count upper bound from the
          // same window walk lets callers drop provably-empty streams
          // (exact count <= count_hi < 1 means the exact query would
          // emit no group for this stream at all).
          val hi = SumEstimator.boundsQuery("count", t0, t1, s, l).upper
          Iterator((sid, opList.map(op => SumEstimator.query(op, t0, t1, s, l, params).value), hi))
        }
      }
      .toDF("stream_id", "estimates", "count_hi")
  }

  /** Hard deterministic answer bounds per stream over [t0, t1]:
    * (stream_id, bound_lo, bound_hi). The exact answer is guaranteed
    * inside [bound_lo, bound_hi] for count (always) and for sum over
    * non-negative values — the estimator's testable contract, checked
    * by the `q_range_count`/`q_range_sum` oracles against an external
    * engine's exact recomputation.
    */
  def rangeBoundsAll(
      sw: Dataset[SummaryWindow],
      lw: Dataset[LandmarkWindow],
      op: String,
      t0: Long,
      t1: Long): DataFrame = {
    val spark = sw.sparkSession
    import spark.implicits._
    val swF = sw.filter($"te" >= t0 && $"ts" <= t1)
    val lwF = lw.filter($"te" >= t0 && $"ts" <= t1)
    swF
      .groupByKey(_.streamId)
      .cogroup(lwF.groupByKey(_.streamId)) { (sid, sws, lws) =>
        val s = sws.toArray.sortBy(_.ts).toSeq
        val l = lws.toArray.sortBy(_.ts).toSeq
        if (s.isEmpty && l.isEmpty) Iterator.empty
        else {
          val b = SumEstimator.boundsQuery(op, t0, t1, s, l)
          Iterator((sid, b.lower, b.upper))
        }
      }
      .toDF("stream_id", "bound_lo", "bound_hi")
  }

  /** Exact estimator answers over each stream's oldest `numWindows`
    * summary windows. The query range [w0.ts, w_{numWindows-1}.te] is
    * aligned to window boundaries, so the estimator must return
    * ci_width = 0 and exactly the raw prefix aggregate — the
    * boundary-sensitive hard-signal check: a summarizer that shifted any
    * boundary would either report nonzero error (stream vanishes →
    * row-count mismatch) or aggregate the wrong element prefix (value
    * mismatch). Streams with fewer windows emit nothing. Output:
    * (stream_id, cnt, sum_value).
    */
  def alignedPrefixAll(sw: Dataset[SummaryWindow], numWindows: Int): DataFrame = {
    val spark = sw.sparkSession
    import spark.implicits._
    sw.groupByKey(_.streamId)
      .flatMapGroups { (sid, it) =>
        val s = it.toArray.sortBy(_.ts).toSeq
        if (s.length < numWindows) Iterator.empty
        else {
          val t0 = s.head.ts
          val t1 = s(numWindows - 1).te
          val overlapping = s.filter(w => w.te >= t0 && w.ts <= t1)
          val c = SumEstimator.countQuery(t0, t1, overlapping, Nil, QueryParams())
          val m = SumEstimator.sumQuery(t0, t1, overlapping, Nil, QueryParams())
          if (c.error != 0.0 || m.error != 0.0) Iterator.empty
          else Iterator((sid, math.rint(c.value).toLong, m.value))
        }
      }
      .toDF("stream_id", "cnt", "sum_raw")
      .select($"stream_id", $"cnt", round($"sum_raw", 2).as("sum_value"))
  }

  /** Exact aggregates over landmark ELEMENT rows restricted to [t0, t1]:
    * (stream_id, cnt, sum_value). Landmark elements are stored verbatim,
    * so this is error-free by construction
    * (`/root/reference/core/sum_estimator.go:82-86`) — and with the row
    * layout it is one pushed-down filter + groupBy, no explode.
    */
  def landmarkExactAll(
      elems: Dataset[LandmarkElem],
      t0: Long,
      t1: Long): DataFrame = {
    val spark = elems.sparkSession
    import spark.implicits._
    elems.filter($"ts" >= t0 && $"ts" <= t1)
      .groupBy($"streamId".as("stream_id"))
      .agg(
        count(lit(1)).as("cnt"),
        sum($"value").as("sum_value"))
  }

  /** Driver-side single-stream query — the reference's public API shape
    * (`Stream.Query(op, t0, t1, params)`) over the row-layout landmark
    * tables. Collects the O(log N) overlapping summary windows and the
    * O(#intervals) landmark DIGESTS of one stream (the element
    * aggregation runs distributed); for fleet-wide queries use
    * [[rangeQueryAll]].
    */
  def queryOne(
      sw: Dataset[SummaryWindow],
      spans: Dataset[LandmarkSpan],
      elems: Dataset[LandmarkElem],
      streamId: Long,
      op: String,
      t0: Long,
      t1: Long,
      params: QueryParams): AggResult = {
    val spark = sw.sparkSession
    import spark.implicits._
    val s = sw
      .filter($"streamId" === streamId && $"te" >= t0 && $"ts" <= t1)
      .collect().sortBy(_.ts).toSeq
    val l = landmarkDigests(
        spans.filter($"streamId" === streamId),
        elems.filter($"streamId" === streamId), t0, t1)
      .collect().sortBy(_.ts).toSeq
    SumEstimator.queryDigest(op, t0, t1, s, l, params)
  }

  /** [[queryOne]] over the driver-side landmark view (golden tests). */
  def queryOne(
      sw: Dataset[SummaryWindow],
      lw: Dataset[LandmarkWindow],
      streamId: Long,
      op: String,
      t0: Long,
      t1: Long,
      params: QueryParams = QueryParams()): AggResult = {
    val spark = sw.sparkSession
    import spark.implicits._
    val s = sw
      .filter($"streamId" === streamId && $"te" >= t0 && $"ts" <= t1)
      .collect().sortBy(_.ts).toSeq
    val l = lw
      .filter($"streamId" === streamId && $"te" >= t0 && $"ts" <= t1)
      .collect().sortBy(_.ts).toSeq
    SumEstimator.query(op, t0, t1, s, l, params)
  }
}
