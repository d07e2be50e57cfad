package graft.core

import graft.functions.Welford.welford
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-stream arrival-interval and value statistics — the reference's
  * `StreamStatistics` (`/root/reference/stats/stream_statistics.go:3-33`),
  * computed distributed: value stats via the Welford aggregator, arrival
  * intervals via `lag` over the per-stream order.
  */
object StreamStats {

  /** (stream_id, n, first_ts, last_ts, value_* , interval_*) per stream.
    * Intervals are successive-timestamp deltas in the stream's append
    * order; the first element contributes no interval (reference
    * `stream_statistics.go:22-27`).
    */
  def perStream(events: Dataset[Event]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    val valueStats = events
      .groupBy($"streamId".as("stream_id"))
      .agg(
        count(lit(1)).as("n"),
        min($"ts").as("first_ts"),
        max($"ts").as("last_ts"),
        welford($"value").as("value_stats"))

    val w = Window.partitionBy($"streamId").orderBy($"seq")
    val intervalStats = events
      .withColumn("iv", ($"ts" - lag($"ts", 1).over(w)).cast("double"))
      .filter($"iv".isNotNull)
      .groupBy($"streamId".as("stream_id"))
      .agg(welford($"iv").as("interval_stats"))

    valueStats
      .join(intervalStats, Seq("stream_id"), "left")
      .select(
        $"stream_id", $"n", $"first_ts", $"last_ts",
        $"value_stats.mean".as("value_mean"),
        $"value_stats.variance".as("value_var"),
        $"value_stats.sample_variance".as("value_svar"),
        $"value_stats.cv".as("value_cv"),
        $"interval_stats.mean".as("interval_mean"),
        $"interval_stats.sample_variance".as("interval_svar"))
  }

  /** Per-stream approximate value quantiles: `percentile_approx` (the
    * built-in Greenwald-Khanna sketch — mergeable, one pass, map-side
    * partial) at the given probabilities. Returns one row per
    * (stream, probability) with the estimate.
    */
  def quantiles(
      events: Dataset[Event],
      probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy($"streamId".as("stream_id"))
      .agg(percentile_approx(
        $"value", array(probs.map(lit): _*), lit(accuracy)).as("ests"))
      .select($"stream_id",
        posexplode($"ests").as(Seq("pi", "est")))
      .select($"stream_id",
        element_at(array(probs.map(lit): _*), $"pi" + 1).as("p"), $"est")
  }

  /** Per-stream rolling aggregates over the last `width` events
    * (inclusive): running smoothing for dashboards and anomaly checks.
    * One shuffle on streamId; the frame is row-bounded so state is
    * O(width) per partition during the sort-based window scan. Emits
    * the rolling count (ramps up over the first rows), the EXACT
    * rolling sum, and rolling min/max.
    */
  def rolling(events: Dataset[Event], width: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"streamId").orderBy($"seq")
      .rowsBetween(-(width - 1).toLong, Window.currentRow)
    events.select(
      $"streamId".as("stream_id"), $"seq", $"ts",
      count(lit(1)).over(w).as("roll_n"),
      sum($"value").over(w).as("roll_sum"),
      min($"value").over(w).as("roll_min"),
      max($"value").over(w).as("roll_max"))
  }

  /** Per-stream tumbling-bucket anomaly scores: bucket the stream into
    * fixed `widthMicros` time windows, score each bucket's mean value
    * against the stream's ROBUST baseline — median of bucket means and
    * MAD (median absolute deviation), the standard outlier-resistant
    * location/scale pair (Hampel; 1.4826·MAD is the normal-consistent
    * sigma). `z = |mean − median| / (1.4826·MAD)` (null when MAD = 0):
    * "which hours deviated from this stream's norm" without the
    * baseline itself being dragged by the anomalies it should flag —
    * the failure mode of a plain mean/stddev z-score.
    *
    * Scale shape: one groupBy to bucket aggregates (events never leave
    * that shuffle), then all remaining passes run over the bucket frame
    * (streams × buckets rows — O(time-range / width) per stream). The
    * exact `percentile` aggregate buffers only bucket MEANS per stream,
    * never raw values. Baselines join back via broadcast (O(#streams)
    * rows).
    */
  def anomalyScores(events: Dataset[Event], widthMicros: Long): DataFrame = {
    require(widthMicros > 0, s"bucket width must be positive: $widthMicros")
    val spark = events.sparkSession
    import spark.implicits._
    // Integer FLOORED division, not double division (epoch-micros
    // magnitude can misplace exact-boundary timestamps — the
    // Ingest.fromEventsTable nanos note) and not bare `div` (which
    // truncates toward zero, bucketing negative timestamps differently
    // from a flooring engine): ts - pmod(ts, w) is the largest
    // multiple of w at or below ts for ANY sign, all in exact longs.
    val buckets = events
      .groupBy($"streamId".as("stream_id"),
        expr(s"(ts - pmod(ts, ${widthMicros}L)) div ${widthMicros}L").as("bucket"))
      .agg(count(lit(1)).as("n"), (sum($"value") / count(lit(1))).as("mean"))
    scoreBuckets(buckets)
  }

  /** The decay-window twin of [[anomalyScores]]: score each SUMMARY
    * window's mean (sum/count — already materialized, no raw scan)
    * against the stream's median/MAD baseline. This is the
    * summary-store-native form: anomaly triage over the whole retained
    * history at O(log N) rows per stream, with the decay partition's
    * resolution (fine recent windows, coarse old ones). Emits
    * (stream_id, bucket = cs, n, mean, med, mad, z).
    */
  def anomalousWindows(summary: Dataset[SummaryWindow]): DataFrame = {
    val spark = summary.sparkSession
    import spark.implicits._
    scoreBuckets(summary
      .select($"streamId".as("stream_id"), $"cs".as("bucket"),
        $"count".cast("long").as("n"), ($"sum" / $"count").as("mean")))
  }

  /** Median/MAD scoring over a (stream_id, bucket, n, mean) frame. */
  private def scoreBuckets(buckets: DataFrame): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    // The bucket frame feeds three passes (median, deviations, output
    // join); localCheckpoint materializes it once so the raw scan
    // behind it is not re-run per pass (the dedupShared discipline).
    val b = buckets.localCheckpoint()
    val med = b.groupBy($"stream_id").agg(percentile($"mean", lit(0.5)).as("med"))
    val withMed = b.join(broadcast(med), "stream_id")
    val mad = withMed
      .groupBy($"stream_id")
      .agg(percentile(abs($"mean" - $"med"), lit(0.5)).as("mad"))
    withMed
      .join(broadcast(mad), "stream_id")
      .select($"stream_id", $"bucket", $"n", $"mean", $"med", $"mad",
        when($"mad" > 0.0, abs($"mean" - $"med") / (lit(1.4826) * $"mad"))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  /** Self-checking contract surface for [[quantiles]]: the estimate's
    * RANK in the stream's exact value order must sit within the GK
    * sketch's guarantee (relative rank error 1/accuracy). The estimate
    * is an actual data value whose possible 1-based ranks span
    * `(count(< est), count(<= est)]` — duplicated values make that an
    * interval, so the check is that this interval intersects
    * `p*n ± (n/accuracy + 1)`, not that a single count equals the
    * target (a tie group would fail a point check spuriously).
    * `within_bound` must be uniformly true — an external engine
    * re-derives `true` from exact data, so a broken sketch or
    * probability plumbing flips the hard signal (the q_approx_distinct
    * pattern).
    *
    * Scale: the estimates frame is streams x probs rows — broadcast to
    * the rank-counting join against raw events; one aggregation pass.
    */
  def quantileContract(
      events: Dataset[Event],
      probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val est = quantiles(events, probs, accuracy)
    val ranks = events.toDF()
      .join(broadcast(est), events("streamId") === est("stream_id"))
      .groupBy($"stream_id", $"p", $"est")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"value" <= $"est", 1L).otherwise(0L)).as("rank_le"),
        sum(when($"value" < $"est", 1L).otherwise(0L)).as("rank_lt"))
    val target = $"p" * $"n".cast("double")
    val eps = $"n".cast("double") / accuracy + 1.0
    ranks.select(
      $"stream_id", $"p",
      (target - eps <= $"rank_le".cast("double") &&
        target + eps >= $"rank_lt".cast("double") + 1.0)
        .as("within_bound"))
  }
}
