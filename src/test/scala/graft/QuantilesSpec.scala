package graft

import graft.core.{Event, StreamStats}
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(n: Int, streams: Int = 4): org.apache.spark.sql.Dataset[Event] =
    spark.range(n).select(
      ($"id" % streams).as("streamId"),
      expr(s"id div $streams").as("seq"),
      (expr(s"id div $streams") * 10L).as("ts"),
      // Per-stream values are a deterministic permutation-ish spread so
      // quantiles are nondegenerate.
      (($"id" * 37L % 1000L).cast("double")).as("value")).as[Event]

  test("estimates carry the advertised rank-error guarantee") {
    val bad = StreamStats.quantileContract(mkEvents(4000), Seq(0.1, 0.5, 0.9, 0.99))
      .filter(!$"within_bound")
    assert(bad.count() == 0)
  }

  test("one row per (stream, probability); probabilities round-trip") {
    val q = StreamStats.quantiles(mkEvents(400), Seq(0.5, 0.9))
    assert(q.count() == 4 * 2)
    assert(q.select($"p").distinct().collect().map(_.getDouble(0)).sorted.toSeq == Seq(0.5, 0.9))
    // Median of ~100 values spread over [0,1000) lands mid-range; p=0.9
    // strictly above the median for every stream.
    val byS = q.groupBy($"stream_id").pivot("p").agg(first($"est")).collect()
    byS.foreach { r => assert(r.getDouble(1) < r.getDouble(2)) }
  }

  test("negative control: a shifted estimate violates the bound check") {
    // Recompute the contract with estimates displaced far outside the
    // rank guarantee — the checker must notice (guards against a
    // vacuously-true bound).
    val events = mkEvents(4000)
    val est = StreamStats.quantiles(events, Seq(0.5))
      .withColumn("est", $"est" + 600.0) // push the median way up
    val ranks = events.toDF()
      .join(broadcast(est), events("streamId") === est("stream_id"))
      .groupBy($"stream_id", $"p", $"est")
      .agg(count(lit(1)).as("n"),
        sum(when($"value" <= $"est", 1L).otherwise(0L)).as("rank_le"),
        sum(when($"value" < $"est", 1L).otherwise(0L)).as("rank_lt"))
    val target = $"p" * $"n".cast("double")
    val eps = $"n".cast("double") / 10000 + 1.0
    val flags = ranks.select(
      (target - eps <= $"rank_le".cast("double") &&
        target + eps >= $"rank_lt".cast("double") + 1.0).as("within_bound"))
    assert(flags.filter($"within_bound").count() == 0)
  }
}
