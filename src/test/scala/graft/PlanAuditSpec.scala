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

  test("contamination scan joins the corpus map-side against a broadcast gram set") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.ops.Contamination
      .flagContamination(docs, docs.filter(col("doc_id") % 17 === 0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"corpus side must not shuffle for the semi-join:\n$plan")
  }

  test("sequence packing shuffles exactly once (on the shard key)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), graft.ops.TextAnalysis.tokenCount(col("text")).as("n_toks"))
    val plan = graft.ops.Packing.packSequences(docs, "n_toks", 512L, 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }
}
