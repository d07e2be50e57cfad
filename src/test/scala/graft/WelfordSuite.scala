package graft

import graft.core.{Event, StreamStats}
import graft.functions.{Welford, WelfordState}
import org.apache.spark.sql.functions._

class WelfordSuite extends SparkSpec {
  import spark.implicits._

  test("golden from welford_test.go: 1..99") {
    var w = WelfordState.zero
    assert(w.variance == 0.0 && w.sampleVariance == 0.0 && w.cv == 0.0)
    (1 until 100).foreach(i => w = w.update(i.toDouble))
    assert(math.abs(w.mean - 50.0) < 1e-4 * 50)
    assert(math.abs(w.variance - 816.666667) < 1e-4 * 816.67)
    assert(math.abs(w.sampleVariance - 825.0) < 1e-4 * 825)
    assert(math.abs(w.cv - 0.5744563) < 1e-4)
  }

  test("parallel merge == sequential fold") {
    val xs = (1 to 1000).map(i => math.sin(i) * 100)
    val seqState = xs.foldLeft(WelfordState.zero)(_.update(_))
    val (l, r) = xs.splitAt(397)
    val merged = l.foldLeft(WelfordState.zero)(_.update(_))
      .merge(r.foldLeft(WelfordState.zero)(_.update(_)))
    assert(math.abs(merged.mean - seqState.mean) < 1e-9)
    assert(math.abs(merged.m2 - seqState.m2) < 1e-6)
    assert(WelfordState.zero.merge(seqState) == seqState)
    assert(seqState.merge(WelfordState.zero) == seqState)
  }

  test("aggregator through Spark agg matches builtins") {
    val df = (1 until 100).map(i => (1L, i.toDouble)).toDF("id", "v")
    val row = df.groupBy($"id").agg(Welford.welford($"v").as("w"),
      avg($"v").as("a"), var_samp($"v").as("vs")).collect().head
    val w = row.getStruct(1)
    assert(math.abs(w.getAs[Double]("mean") - row.getAs[Double]("a")) < 1e-9)
    assert(math.abs(w.getAs[Double]("sample_variance") - row.getAs[Double]("vs")) < 1e-9)
    assert(w.getAs[Long]("count") == 99L)
  }

  test("StreamStats.perStream: intervals and values") {
    // Stream with ts 0, 10, 30: intervals 10, 20 -> mean 15.
    val events = Seq(
      Event(1L, 0, 0, 2.0), Event(1L, 1, 10, 4.0), Event(1L, 2, 30, 6.0),
      Event(2L, 0, 5, 1.0)).toDS()
    val rows = StreamStats.perStream(events).collect()
      .map(r => r.getAs[Long]("stream_id") -> r).toMap
    val s1 = rows(1L)
    assert(s1.getAs[Long]("n") == 3L)
    assert(s1.getAs[Double]("value_mean") == 4.0)
    assert(s1.getAs[Double]("interval_mean") == 15.0)
    // Single-element stream: no intervals -> null columns, n=1.
    val s2 = rows(2L)
    assert(s2.getAs[Long]("n") == 1L)
    assert(s2.isNullAt(s2.fieldIndex("interval_mean")))
  }
}
