package graft

import graft.core.{Event, FreqSummary}
import graft.plans.SummaryRewrite
import graft.windowing.ExponentialWindowing
import org.apache.spark.sql.functions._

/** The CMS count rewrite: COUNT over a value-equality filter on a
  * registered raw relation re-plans onto the windowed freq table under
  * the approximate flag — O(log N) sketch rows instead of the raw scan.
  */
class FreqRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val base = java.nio.file.Files.createTempDirectory("graft_freqrw").toString
  private val eventsPath = s"$base/events"
  private val freqPath = s"$base/freq"

  override def beforeAll(): Unit = {
    super.beforeAll()
    // 4200 events: 7 streams x 3 values, every (stream, value) pair
    // appears exactly 200 times.
    val events = spark.range(4200)
      .select(
        ($"id" % 7L).as("streamId"),
        expr("id div 7").as("seq"),
        expr("(id div 7) * 10").as("ts"),
        ($"id" % 3L).cast("double").as("value"))
      .as[Event]
    events.toDF().write.mode("overwrite").parquet(eventsPath)
    FreqSummary.summarize(events, ExponentialWindowing(2.0))
      .write.mode("overwrite").parquet(freqPath)
    SummaryRewrite.registerFreqSet(Seq(eventsPath), freqPath)
    SummaryRewrite.install(spark)
    spark.conf.set("spark.graft.rewrite.approximate", "true")
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.rewrite.approximate")
    SummaryRewrite.unregisterFreqSet(Set(new org.apache.hadoop.fs.Path(eventsPath).toUri.getPath))
    super.afterAll()
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("grouped count under a value-equality filter reads the freq table, exactly here") {
    val q = spark.read.parquet(eventsPath)
      .filter($"value" === 1.0)
      .groupBy($"streamId").agg(count(lit(1)).as("n"))
    val p = plan(q)
    assert(p.contains("/freq"), s"freq table not scanned:\n$p")
    assert(!p.contains("/events"), s"raw events still scanned:\n$p")
    // CMS is exact at 3 keys in 200-wide rows.
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      (0L to 6L).map((_, 200L)).toSeq)
  }

  test("global count with a transplanted streamId predicate") {
    val q = spark.read.parquet(eventsPath)
      .filter($"value" === 2.0 && $"streamId" === 3L)
      .agg(count(lit(1)).as("n"))
    assert(plan(q).contains("/freq"))
    assert(q.collect().head.getLong(0) == 200L)
  }

  test("approximate flag off -> raw scan") {
    spark.conf.set("spark.graft.rewrite.approximate", "false")
    try {
      val q = spark.read.parquet(eventsPath)
        .filter($"value" === 1.0)
        .groupBy($"streamId").agg(count(lit(1)).as("n"))
      assert(plan(q).contains("/events"))
    } finally spark.conf.set("spark.graft.rewrite.approximate", "true")
  }

  test("a time-range conjunct disqualifies the rewrite") {
    val q = spark.read.parquet(eventsPath)
      .filter($"value" === 1.0 && $"ts" > 100L)
      .groupBy($"streamId").agg(count(lit(1)).as("n"))
    assert(plan(q).contains("/events"), "range+equality must stay on raw events")
  }

  test("non-count aggregates are untouched") {
    val q = spark.read.parquet(eventsPath)
      .filter($"value" === 1.0)
      .groupBy($"streamId").agg(sum($"seq").as("s"))
    assert(plan(q).contains("/events"))
  }

  test("SummaryDB integration: the maintained freq table answers value counts across appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_freqrw_db").toString
    val db = graft.core.SummaryDB.open(spark, dir)
    db.enableFreqSummaries()
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(lit(4L).as("streamId"), $"id".as("seq"), ($"id" * 3).as("ts"),
        ($"id" % 2).cast("double").as("value")).as[Event]
    db.appendOnce(0L, batch(0, 40))
    db.appendOnce(1L, batch(40, 100))
    val q = db.rawEvents.filter($"value" === 1.0)
      .groupBy($"streamId").agg(count(lit(1)).as("n"))
    assert(plan(q).contains("freq_sketches"), plan(q))
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 50L)))
  }
}
