package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("nearest-past match, inclusive at equal ts, null before first mark") {
    val left = Seq(
      (1L, 5L, "a"), (1L, 10L, "b"), (1L, 11L, "c"), (1L, 25L, "d"),
      (2L, 7L, "e")).toDF("streamId", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 20L, 200.0),
      (2L, 8L, 300.0)).toDF("streamId", "ts", "v")

    val out = AsofJoin.asofJoin(left, right, "streamId", "ts", Seq("v"))
      .select($"streamId", $"ts", $"tag", $"asof_ts", $"asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).sortBy(t => (t._1, t._2))

    assert(out.toSeq == Seq(
      (1L, 5L, "a", -1L, -1.0),      // before any mark -> nulls
      (1L, 10L, "b", 10L, 100.0),    // coincident mark is visible (>= semantics)
      (1L, 11L, "c", 10L, 100.0),    // nearest past
      (1L, 25L, "d", 20L, 200.0),    // latest past, not first
      (2L, 7L, "e", -1L, -1.0)))     // other key's marks invisible
  }

  test("agrees with a brute-force range-join formulation on random-ish data") {
    val left = spark.range(500).select(
      ($"id" % 5L).as("streamId"), ($"id" * 7L % 1000L).as("ts"), $"id".as("lid"))
    val right = spark.range(80).select(
      ($"id" % 5L).as("streamId"), ($"id" * 61L % 990L + 1L).as("ts"), ($"id" * 1.5).as("v"))
      // De-dup coincident (streamId, ts) marks — asof tie-pick among
      // exactly-equal mark timestamps is not defined by the operator.
      .groupBy($"streamId", $"ts").agg(max($"v").as("v"))

    val fast = AsofJoin.asofJoin(left, right, "streamId", "ts", Seq("v"))
      .select($"lid", $"asof_ts", $"asof_v")

    val brute = left.as("l").join(right.as("r"),
        $"l.streamId" === $"r.streamId" && $"l.ts" >= $"r.ts", "left")
      .groupBy($"lid", $"l.streamId", $"l.ts")
      .agg(max(struct($"r.ts".as("mts"), $"r.v")).as("m"))
      .select($"lid", $"m.mts".as("asof_ts"), $"m.v".as("asof_v"))

    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("plan shape: one shuffle on the key, no join explosion") {
    val left = spark.range(100).select(($"id" % 3L).as("streamId"), $"id".as("ts"), $"id".as("lid"))
    val right = spark.range(10).select(($"id" % 3L).as("streamId"), ($"id" * 9L).as("ts"), $"id".cast("double").as("v"))
    val plan = AsofJoin.asofJoin(left, right, "streamId", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"asof must not plan a product join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"asof is a union + window, not a join:\n$plan")
  }
}
