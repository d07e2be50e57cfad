package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval join of two STREAMS — facts enriched by the
  * interval (campaign, session, experiment window) containing them —
  * on Spark's NATIVE stream-stream join machinery: both sides
  * watermarked, key equality plus an event-time range condition, so
  * the state store retains each side only within the watermark +
  * `maxSpanMicros` horizon (bounded state by construction; an
  * unbounded-span interval stream cannot be joined online, which is
  * why the span cap is part of the API, not a tuning afterthought).
  *
  * This is the built-in-first counterpart of [[graft.ops.IntervalJoin]]
  * (batch, bin-and-filter): Structured Streaming already plans a
  * watermark-bounded range join correctly, so the streaming operator
  * WRAPS the built-in instead of reimplementing it — parity with the
  * batch operator on the same data is the spec contract.
  *
  * Inputs carry microsecond-long event times (the engine convention);
  * the wrapper derives timestamp columns for the watermarks and drops
  * them from the output.
  */
object StreamingIntervalJoin {

  /** Join streaming `facts` (point `tsCol`, micros) with streaming
    * `intervals` ([loCol, hiCol], micros, hi - lo <= maxSpanMicros) on
    * `key` equality + containment. `delay` is the watermark for both
    * sides (how late data may arrive). Output: fact columns + interval
    * columns (minus the key duplicate), append-mode ready.
    */
  def join(
      facts: DataFrame,
      intervals: DataFrame,
      key: String,
      tsCol: String,
      loCol: String,
      hiCol: String,
      maxSpanMicros: Long,
      delay: String = "0 seconds"): DataFrame = {
    require(maxSpanMicros > 0, s"maxSpanMicros > 0: $maxSpanMicros")
    val f = facts
      .withColumn("__ft", timestamp_micros(col(tsCol)))
      .withWatermark("__ft", delay)
      .alias("f")
    val iv = intervals
      .withColumn("__it", timestamp_micros(col(loCol)))
      .withWatermark("__it", delay)
      .alias("i")
    // The JOIN CONDITION carries only what the state manager can turn
    // into eviction bounds: key equality + a range over the two
    // WATERMARKED time columns (__ft in [__it, __it + maxSpan]). The
    // exact containment on the raw micros (hi may end before
    // lo + maxSpan) applies as a stateless POST-JOIN filter — putting
    // non-time-attribute conjuncts inside the condition defeats
    // Spark's state-constraint extraction (it logs an internal error
    // and falls back to unbounded state).
    f.join(iv,
        col(s"f.$key") === col(s"i.$key") &&
          col("__ft") >= col("__it") &&
          col("__ft") <= col("__it") + expr(s"INTERVAL $maxSpanMicros MICROSECOND"))
      .filter(col(s"f.$tsCol") >= col(s"i.$loCol") && col(s"f.$tsCol") <= col(s"i.$hiCol"))
      .drop(col(s"i.$key"))
      .drop("__ft").drop("__it")
  }
}
