package graft

import graft.sources.BucketedLayout
import org.apache.spark.sql.functions._

class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join: no Exchange on either side, rows exact") {
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = docs.select($"doc_id", length($"text").as("n"))
    BucketedLayout.writeBucketed(docs, "b_docs", s"$base/docs", "doc_id", 4)
    BucketedLayout.writeBucketed(stats, "b_stats", s"$base/stats", "doc_id", 4)
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ so absence of Exchange is meaningful
        "spark.sql.adaptive.enabled" -> "false") {
        val joined = BucketedLayout.readBucketed(spark, "b_docs")
          .join(BucketedLayout.readBucketed(spark, "b_stats"), "doc_id")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle:\n$plan")
        // And the join is correct, not just shuffle-free.
        assert(joined.count() == docs.count())
        val sample = joined.filter($"doc_id" === 7).select($"n").as[Int].head()
        val expect = docs.filter($"doc_id" === 7).select(length($"text")).as[Int].head()
        assert(sample == expect)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_stats")
    }
  }

  test("non-bucketed baseline DOES shuffle (the control)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = docs.select($"doc_id", length($"text").as("n"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val plan = docs.join(stats, "doc_id").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"control should shuffle — if it doesn't, the bucketed assert is vacuous:\n$plan")
    }
  }

  test("compact: many small files -> few target-size files, rows identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = spark.range(10000).select($"id", ($"id" % 97).as("v"))
    df.repartition(64).write.parquet(dir) // 64 tiny files
    val before = new java.io.File(dir).listFiles().count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(before >= 32, s"setup failed: only $before files")
    val totalBytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.length).sum
    val after = BucketedLayout.compact(spark, dir, targetBytes = totalBytes / 4 + 1)
    assert(after <= 4, s"expected <= 4 files after compaction, saw $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(sum($"v")).as[Long].head() == df.agg(sum($"v")).as[Long].head())
    // No leftover tmp/old directories.
    assert(!new java.io.File(dir + ".__compact_tmp").exists())
    assert(!new java.io.File(dir + ".__compact_old").exists())
  }

  test("compact: empty-ish directory still atomic and readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    spark.range(1).write.parquet(dir)
    val n = BucketedLayout.compact(spark, dir)
    assert(n == 1L)
    assert(spark.read.parquet(dir).count() == 1)
  }
}
