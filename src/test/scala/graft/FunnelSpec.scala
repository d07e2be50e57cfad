package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._

/** Anchored-window funnel: greedy-earliest step matching, strict
  * ordering, window anchored at step 1, no step skipping, and the
  * at-least-depth report.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "ts_us", "event_type")

  private val steps = Seq("view", "click", "buy")

  private def depths(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    Funnel.funnel(df, steps, windowMicros = 100L)
      .select("user_id", "depth").as[(Long, Int)].collect().toMap

  test("full conversion, partial conversion, and non-starters") {
    val df = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      (2L, 10L, "view"), (2L, 20L, "click"),
      (3L, 10L, "click"), (3L, 20L, "buy")) // never viewed: no row
    val d = depths(df)
    assert(d == Map(1L -> 3, 2L -> 2))
  }

  test("steps must be strictly ordered in time") {
    val df = ev(
      (1L, 30L, "view"), (1L, 20L, "click"), (1L, 40L, "buy"), // click BEFORE view
      (2L, 10L, "view"), (2L, 10L, "click")) // simultaneous: not strictly after
    val d = depths(df)
    assert(d == Map(1L -> 1, 2L -> 1))
  }

  test("window anchors at step 1: late steps beyond t1+w do not count") {
    val df = ev(
      (1L, 0L, "view"), (1L, 50L, "click"), (1L, 101L, "buy"), // buy outside [0,100]
      (2L, 0L, "view"), (2L, 100L, "click")) // boundary inclusive
    val d = depths(df)
    assert(d == Map(1L -> 2, 2L -> 2))
  }

  test("no step skipping: missing middle step blocks later ones") {
    val df = ev(
      (1L, 0L, "view"), (1L, 10L, "buy")) // no click
    assert(depths(df) == Map(1L -> 1))
  }

  test("greedy earliest anchor: the first view anchors, not the best one") {
    // view@0 anchors the window [0,100]; the view@90 would allow
    // buy@150, but anchored semantics bind to the earliest.
    val df = ev(
      (1L, 0L, "view"), (1L, 90L, "view"), (1L, 95L, "click"), (1L, 150L, "buy"))
    assert(depths(df) == Map(1L -> 2))
  }

  test("greedy earliest never blocks: earliest valid step-2 still admits step-3") {
    val df = ev(
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 6L, "buy"))
    assert(depths(df) == Map(1L -> 3))
  }

  test("funnelCounts: at-least-depth conversion report, zeros included") {
    val df = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      (2L, 10L, "view"), (2L, 20L, "click"),
      (3L, 10L, "view"))
    val counts = Funnel.funnelCounts(df, steps, 100L)
      .select("depth", "users").as[(Int, Long)].collect().toMap
    assert(counts == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    // A step nobody reaches reports 0, not a missing row.
    val c2 = Funnel.funnelCounts(ev((1L, 10L, "view")), steps, 100L)
      .select("depth", "users").as[(Int, Long)].collect().toMap
    assert(c2 == Map(1 -> 1L, 2 -> 0L, 3 -> 0L))
  }

  test("real events table: funnel depths are stable and plan is join-shaped") {
    val raw = graft.core.Ingest.eventsTableRaw(spark, "/root/testdata/sf0.001")
    val f = Funnel.funnel(raw, Seq("view", "click", "purchase"), 3600L * 1000000L)
    val n = f.count()
    assert(n > 0)
    val plan = f.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"funnel must stay an equi-join chain:\n$plan")
  }
}
