package graft.streaming

import graft.core.Event
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation over a streaming event
  * source — the canonical Structured Streaming shape (watermark +
  * `window()` + windowed agg) surfaced as an engine operator: the
  * streaming counterpart of `Summarizer`'s batch windows, for
  * dashboards that want fixed wall-clock buckets of the most recent
  * data next to the decayed long-term summary.
  *
  * Watermarking bounds state: a window's state is dropped once the
  * watermark (max observed event time minus `lateness`) passes its
  * end, and later-than-watermark events are discarded — the documented
  * completeness/state trade. In append output mode a window row is
  * emitted exactly once, when it finalizes; the sink sees each bucket
  * exactly once per (stream, window).
  *
  * Scale: per-(stream, window) state is one count/sum/max/min tuple —
  * O(active windows x streams) total, watermark-bounded; the shuffle
  * is the same single groupBy any windowed agg pays.
  */
object StreamingWindowedAgg {

  /** Tumbling windows of `windowLength` with `lateness` watermark over
    * a (possibly streaming) Dataset[Event]; `ts` is epoch MICROS (the
    * engine's native unit). Output: one row per (stream, window) with
    * count/sum/max/min and the window's [start, end) micros.
    */
  def tumbling(
      events: Dataset[Event],
      windowLength: String = "10 seconds",
      lateness: String = "5 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros($"ts"))
      .withWatermark("event_time", lateness)
      .groupBy($"streamId".as("stream_id"), window($"event_time", windowLength))
      .agg(
        count(lit(1)).as("n"),
        sum($"value").as("sum"),
        max($"value").as("max"),
        min($"value").as("min"),
        // The streaming face of DistinctSummary: the same mergeable HLL
        // partial per (stream, window), so a sink can union bucket
        // sketches later exactly like the batch sketch table.
        hll_sketch_agg(graft.core.DistinctSummary.canonicalValue($"value"), lit(12)).as("sketch"))
      .select(
        $"stream_id",
        unix_micros($"window.start").as("ws"),
        unix_micros($"window.end").as("we"),
        $"n", $"sum", $"max", $"min",
        hll_sketch_estimate($"sketch").cast("long").as("n_distinct"),
        $"sketch")
  }

  /** As [[tumbling]] with the full per-bucket sketch set of the batch
    * freq table ([[graft.core.FreqSummary]]): bloom + CMS + Misra-Gries
    * candidates next to the HLL, plus the [[graft.core.QuantileSummary]]
    * KLL sketch — the streaming face of the windowed
    * bloom/cms/freq/quantile ops. Each finalized bucket row carries mergeable
    * states in the SAME wire formats the batch table stores, so a sink
    * can append buckets to a freq-style table and range queries
    * (membership / frequency / heavy hitters) union them exactly like
    * batch windows. State per (stream, window) is the fixed sketch
    * geometry (~16 KB at the defaults), watermark-bounded.
    */
  def tumblingWithSketches(
      events: Dataset[Event],
      windowLength: String = "10 seconds",
      lateness: String = "5 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val canon = graft.core.DistinctSummary.canonicalValue($"value")
    events
      .withColumn("event_time", timestamp_micros($"ts"))
      .withWatermark("event_time", lateness)
      .groupBy($"streamId".as("stream_id"), window($"event_time", windowLength))
      .agg(
        count(lit(1)).as("n"),
        sum($"value").as("sum"),
        max($"value").as("max"),
        min($"value").as("min"),
        hll_sketch_agg(canon, lit(12)).as("sketch"),
        graft.functions.Sketches.bloomAgg(canon,
          graft.core.FreqSummary.ExpectedItems, graft.core.FreqSummary.Fpp).as("bloom"),
        graft.functions.Sketches.cmsAgg(canon,
          graft.core.FreqSummary.Eps, graft.core.FreqSummary.Confidence).as("cms"),
        graft.functions.Sketches.mgAgg(canon,
          graft.core.FreqSummary.MgCapacity).as("cand"),
        graft.functions.QuantileSketch.qsAgg($"value",
          graft.core.QuantileSummary.K).as("qsk"))
      .select(
        $"stream_id",
        unix_micros($"window.start").as("ws"),
        unix_micros($"window.end").as("we"),
        $"n", $"sum", $"max", $"min",
        hll_sketch_estimate($"sketch").cast("long").as("n_distinct"),
        $"sketch", $"bloom", $"cms", $"cand", $"qsk")
  }
}
