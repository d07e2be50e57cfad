package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: exact membership, multiplicity 1, inclusive bounds") {
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 15L), (2L, 10L)).toDF("k", "ts")
    val ivals = Seq((1L, 0L, 10L, "a"), (1L, 10L, 20L, "b"), (2L, 0L, 4L, "c"))
      .toDF("k", "lo", "hi", "tag")
    val out = IntervalJoin.join(facts, ivals, "ts", "lo", "hi", keys = Seq("k"), bucketWidth = 3L)
      .select($"k", $"ts", $"tag").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // ts=10 is in BOTH [0,10] and [10,20] (inclusive); ts=5 in a; ts=15 in b;
    // (2,10) matches nothing.
    assert(out.sorted.toSeq == Seq((1L, 5L, "a"), (1L, 10L, "a"), (1L, 10L, "b"), (1L, 15L, "b")))
  }

  test("matches a brute-force non-equi join on real events x sessions") {
    val ev = graft.core.Ingest.fromEventsTable(spark, "/root/testdata/sf0.001").toDF()
      .select($"streamId".as("stream_id"), $"ts", $"seq")
    val sess = graft.ops.Sessionize
      .sessionize(graft.core.Ingest.fromEventsTable(spark, "/root/testdata/sf0.001"),
        6L * 3600 * 1000000)
      .select($"stream_id", $"session_idx", $"ts_start", $"ts_end")
    val got = IntervalJoin.join(ev, sess, "ts", "ts_start", "ts_end", keys = Seq("stream_id"))
      .select($"stream_id", $"seq", $"session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = ev.as("e").join(sess.as("s"),
        $"e.stream_id" === $"s.stream_id" && $"e.ts" >= $"s.ts_start" && $"e.ts" <= $"s.ts_end")
      .select($"e.stream_id", $"e.seq", $"s.session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // every event belongs to exactly one of its stream's sessions
    assert(got.size == ev.count())
  }

  test("plans a hash join, not a nested loop") {
    val facts = spark.range(100).select($"id".as("k"), ($"id" * 7).as("ts"))
    val ivals = spark.range(20).select($"id".as("k"), ($"id" * 30).as("lo"), ($"id" * 30 + 29).as("hi"))
    val plan = IntervalJoin.join(facts, ivals, "ts", "lo", "hi", keys = Seq("k"), bucketWidth = 30L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degraded to a nested loop:\n$plan")
  }

  test("randomized parity with the brute-force non-equi join") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val facts = Seq.fill(200)((rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong))
        .toDF("k", "ts")
      val ivals = Seq.fill(50) {
        val lo = rnd.nextInt(1000).toLong
        (rnd.nextInt(6).toLong, lo, lo + rnd.nextInt(300).toLong, rnd.nextInt(100))
      }.toDF("k", "lo", "hi", "tag")
      val width = 1L + rnd.nextInt(400)
      val got = IntervalJoin.join(facts, ivals, "ts", "lo", "hi", Seq("k"), bucketWidth = width)
        .select($"k", $"ts", $"lo", $"hi", $"tag")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = facts.as("f").join(ivals.as("i"),
          $"f.k" === $"i.k" && $"f.ts" >= $"i.lo" && $"f.ts" <= $"i.hi")
        .select($"f.k", $"ts", $"lo", $"hi", $"tag")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want, s"trial $trial width $width diverged")
    }
  }

  test("empty interval table: empty result, auto width does not crash") {
    val facts = Seq((1L, 5L)).toDF("k", "ts")
    val ivals = Seq.empty[(Long, Long, Long, String)].toDF("k", "lo", "hi", "tag")
    assert(IntervalJoin.join(facts, ivals, "ts", "lo", "hi", keys = Seq("k")).isEmpty)
  }

  test("degenerate interval fails loudly instead of exploding") {
    val facts = Seq((1L, 5L)).toDF("k", "ts")
    val ivals = Seq((1L, 0L, Long.MaxValue / 4, "boom")).toDF("k", "lo", "hi", "tag")
    val e = intercept[Exception] {
      IntervalJoin.join(facts, ivals, "ts", "lo", "hi", keys = Seq("k"),
        bucketWidth = 10L, maxBucketsPerInterval = 1000L).count()
    }
    assert(e.getMessage != null)
  }
}
