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
}
