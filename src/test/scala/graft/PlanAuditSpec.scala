package graft

/** Automated plan audit: no registered query may compile to a
  * cartesian product or a broadcast nested-loop join — the two shapes
  * that mean an operator silently degraded to all-pairs and will not
  * survive a scale-up. Guards every future query registration.
  */
class PlanAuditSpec extends SparkSpec {

  test("no registered query plans a cartesian or nested-loop join") {
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
      if (bad.isEmpty) None else Some(s"$name -> ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty, s"scale-hostile join shapes: $offenders")
  }

  test("flagship entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
