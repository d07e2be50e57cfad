package graft.ops

import graft.core.Event
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each stream into activity sessions separated
  * by quiet gaps of at least `gapMicros` — the standard unit of
  * user-behavior analysis and the reference point for every "events per
  * visit" metric.
  *
  * Batch path is gaps-and-islands: a per-stream break flag (gap >= the
  * threshold) cumulative-summed into a session index — two window
  * passes over ONE shuffle's sort order, no self-join. Streaming path
  * is the built-in `session_window` (watermark-bounded state, merges
  * on arrival). Both use the same half-open convention: an event
  * exactly `gap` after its predecessor starts a NEW session, matching
  * `session_window`'s `[start, last + gap)` windows, so the two paths
  * agree row-for-row on the same data.
  */
object Sessionize {

  /** Per-session rollup: (stream_id, session_idx 1-based, n, ts_start,
    * ts_end, sum_value). Sessions are ordered by time within a stream.
    */
  def sessionize(events: Dataset[Event], gapMicros: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"streamId").orderBy($"seq")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag($"ts", 1).over(w)
    events
      .withColumn("brk",
        when(prev.isNull || $"ts" - prev >= gapMicros, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"brk").over(run))
      .groupBy($"streamId".as("stream_id"), $"session_idx")
      .agg(
        count(lit(1)).as("n"),
        min($"ts").as("ts_start"),
        max($"ts").as("ts_end"),
        sum($"value").as("sum_value"))
  }

  /** Streaming sessions via `session_window` (dynamic-gap state merged
    * on arrival, watermark-evicted). Append mode emits each session
    * once, when the watermark passes its close.
    */
  def streamingSessions(
      events: Dataset[Event],
      gap: String = "30 minutes",
      lateness: String = "5 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros($"ts"))
      .withWatermark("event_time", lateness)
      .groupBy($"streamId".as("stream_id"), session_window($"event_time", gap))
      .agg(
        count(lit(1)).as("n"),
        sum($"value").as("sum_value"))
      .select($"stream_id",
        unix_micros($"session_window.start").as("ts_start"),
        $"n", $"sum_value")
  }
}
