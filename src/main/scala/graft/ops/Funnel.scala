package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel analysis over an event stream: how far each user advances
  * through an ordered step sequence (view → click → purchase) within
  * a time window anchored at the FIRST step — the standard product-
  * analytics operator (ClickHouse `windowFunnel` semantics: greedy
  * earliest matching, strictly increasing timestamps, every step
  * inside `[t1, t1 + window]`).
  *
  * Shape for 100 TB: one filter+groupBy per step (map-side
  * combinable min over the per-user step events — each pass touches
  * only that step's rows), chained by equi-joins on the user key; K-1
  * joins for a K-step funnel, all co-partitioned on the user after
  * the first shuffle, no per-user event arrays ever materialize and
  * nothing is sequential per user. Greedy-earliest is exact for
  * anchored-window funnels: taking the earliest valid occurrence of
  * step i never blocks a later step (any step-(i+1) match for a later
  * step-i occurrence is also a match for the earlier one, since the
  * window is anchored at step 1, not step i).
  */
object Funnel {

  /** Per-user funnel state: (userCol, depth, t1) where `depth` is the
    * number of consecutive steps completed (0 = never did step 1 —
    * those users are omitted; join back if zeros are needed) and `t1`
    * the anchoring first-step time. `tsCol` must be monotone-
    * comparable (epoch micros); `windowMicros` in the same unit.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      windowMicros: Long,
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"funnel steps must be distinct: $steps")
    require(windowMicros > 0, s"window must be positive: $windowMicros")
    val u = col(userCol)

    // Step 1: earliest occurrence per user — the window anchor.
    val s1 = events.where(col(typeCol) === steps.head)
      .groupBy(u.as("__fn_user"))
      .agg(min(col(tsCol)).as("t1"))
      .withColumn("__fn_prev", col("t1"))
      .withColumn("depth", lit(1))

    // Step i+1: earliest occurrence strictly after the user's step-i
    // time and within the anchored window. Only users AT depth i can
    // advance (the `depth === i` join conjunct — a user stuck earlier
    // must not skip the missing step); a left join keeps stuck users,
    // whose row reports the depth they reached.
    val done = steps.zipWithIndex.drop(1).foldLeft(s1) { case (acc, (step, i)) =>
      val cand = events.where(col(typeCol) === step)
        .select(u.as("__fn_cuser"), col(tsCol).as("__fn_cts"))
      acc.join(cand,
          col("__fn_user") === col("__fn_cuser") &&
            col("depth") === i &&
            col("__fn_cts") > col("__fn_prev") &&
            col("__fn_cts") <= col("t1") + windowMicros,
          "left")
        .groupBy(col("__fn_user"), col("t1"), col("__fn_prev"), col("depth"))
        .agg(min(col("__fn_cts")).as("__fn_next"))
        .select(col("__fn_user"), col("t1"),
          coalesce(col("__fn_next"), col("__fn_prev")).as("__fn_prev"),
          when(col("__fn_next").isNotNull, lit(i + 1)).otherwise(col("depth")).as("depth"))
    }
    done.select(col("__fn_user").as(userCol), col("depth"), col("t1"))
  }

  /** The funnel report: users reaching AT LEAST each depth
    * (depth, users), the numbers a conversion chart plots. One extra
    * tiny aggregation over [[funnel]].
    */
  def funnelCounts(
      events: DataFrame,
      steps: Seq[String],
      windowMicros: Long,
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val f = funnel(events, steps, windowMicros, userCol, tsCol, typeCol)
    // "At least depth d" = reverse cumulative sum of the exact-depth
    // counts — a window over K rows, never a range join (which would
    // plan as the BroadcastNestedLoopJoin shape PlanAuditSpec forbids).
    val exact = f.groupBy($"depth".as("__fn_d")).agg(count(lit(1)).as("__fn_n"))
    val depths = spark.range(1, steps.size + 1L).select($"id".cast("int").as("depth"))
    // Deliberately partition-less: the frame at this point is exactly
    // K rows (one per funnel step), so the single-partition WindowExec
    // Spark warns about is a K-row sort, not a scale hazard.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"depth".desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    depths.join(exact, $"depth" === $"__fn_d", "left")
      .select($"depth", coalesce($"__fn_n", lit(0L)).as("n"))
      .select($"depth", sum($"n").over(w).as("users"))
  }
}
