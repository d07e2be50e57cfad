package graft

import graft.ops.DedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted exact-dedup index: cross-batch semantics (build / probe /
  * append), exactly-once ingest on redelivery, and the plan contract —
  * the bucketed index side never exchanges, the batch exchanges once,
  * and no operator in the pipeline is a rank window (hot duplicate
  * classes collapse map-side, the r10 skew discipline).
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String) = {
    n += 1
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
    (dir, s"graft_test_dedup_idx_$n")
  }

  private def mk(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("filterNew drops known content, keeps one min-id survivor per new hash") {
    val (dir, tbl) = fresh()
    DedupIndex.build(
      mk(1L -> "alpha body", 2L -> "beta body", 3L -> "ALPHA   body"), dir, tbl, nBuckets = 4)
    // "alpha body" known (normalization folds case/whitespace), "gamma" new twice, "delta" new once
    val out = DedupIndex.filterNew(spark, tbl,
      mk(10L -> "gamma body", 11L -> "alpha body", 12L -> "GAMMA  body", 13L -> "delta body"))
      .select($"doc_id", $"n_dups").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 2L), (13L, 1L)))
  }

  test("ingest appends survivors; redelivering the same batch returns empty") {
    val (dir, tbl) = fresh()
    DedupIndex.build(mk(1L -> "seed page"), dir, tbl, nBuckets = 4)
    val batch = mk(20L -> "new page one", 21L -> "new page two", 22L -> "seed page")
    val first = DedupIndex.ingest(spark, tbl, batch)
    assert(first.select($"doc_id").as[Long].collect().toSet == Set(20L, 21L))
    assert(first.columns.toSeq == Seq("doc_id", "text"), "ingest returns the batch's own columns")
    // exactly-once: the appended hashes make redelivery a no-op
    assert(DedupIndex.ingest(spark, tbl, batch).isEmpty)
    // the index now holds seed + both survivors, readable through the catalog
    val hashes = spark.table(tbl).select($"text_hash").as[String].collect()
    assert(hashes.length == 3 && hashes.distinct.length == 3)
    // and a LATER batch duplicating an ingested page is filtered by it
    assert(DedupIndex.ingest(spark, tbl, mk(30L -> "NEW PAGE ONE")).isEmpty)
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("plan: index side never exchanges, batch exchanges once, no window") {
    val (dir, tbl) = fresh()
    DedupIndex.build(
      mk((1L to 50L).map(i => i -> s"seed $i"): _*), dir, tbl, nBuckets = 4)
    // Force the join shape the 100-TB layout exists for (a tiny test
    // index would otherwise broadcast and bypass bucketing entirely;
    // AQE off for a stable plan string).
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = DedupIndex.filterNew(spark, tbl, mk(100L -> "probe a", 101L -> "probe b"))
      val out = df.queryExecution.executedPlan.toString
      assert(!out.contains("Window"), s"rank window in the ingest plan:\n$out")
      val exchanges = out.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(exchanges == 1,
        s"expected exactly ONE exchange (the batch into the index bucketing), got $exchanges:\n$out")
      // and the single exchange hashes the BATCH side, not the index scan
      assert(out.contains("SortMergeJoin") || out.contains("ShuffledHashJoin"),
        s"expected a shuffled anti-join against the bucketed index:\n$out")
    }
  }

  private def dataFiles(dir: String): Array[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/hashes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter { st =>
      st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
    }.map(_.getPath.getName)
  }

  test("compact: append-grown file count collapses, probe answers identical, still bucketed") {
    val (dir, tbl) = fresh()
    DedupIndex.build(mk(1L -> "seed page"), dir, tbl, nBuckets = 4)
    (0 until 5).foreach { b =>
      DedupIndex.ingest(spark, tbl, mk(
        (100L + 2 * b) -> s"batch $b page x", (101L + 2 * b) -> s"batch $b page y"))
    }
    val before = dataFiles(dir).length
    assert(before > 4, s"appends should have grown the file count, got $before")
    val probe = mk(900L -> "batch 3 page x", 901L -> "never seen")
    val wantIds = DedupIndex.filterNew(spark, tbl, probe)
      .select($"doc_id").as[Long].collect().toSet
    assert(wantIds == Set(901L))
    val after = DedupIndex.compact(spark, tbl, dir)
    assert(after <= 4 && after < before, s"compact: $before -> $after files")
    assert(DedupIndex.filterNew(spark, tbl, probe)
      .select($"doc_id").as[Long].collect().toSet == wantIds)
    assert(spark.table(tbl).count() == 11) // seed + 10 ingested survivors
    // the new generation (and post-compact appends) still join bucketed:
    // force the shuffled shape and require the single batch-side exchange
    DedupIndex.ingest(spark, tbl, mk(950L -> "post compact page"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val out = DedupIndex.filterNew(spark, tbl, probe)
        .queryExecution.executedPlan.toString
      val exchanges = out.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(exchanges == 1, s"bucketing lost after compact+append:\n$out")
    }
    // every data file carries a bucket tag the scan can trust
    assert(dataFiles(dir).forall(_.matches(".*_\\d{5}(\\.c\\d+)?\\.snappy\\.parquet")),
      s"untagged bucket files: ${dataFiles(dir).mkString(", ")}")
  }

  test("compact retires zombie duplicate rows without changing answers") {
    val (dir, tbl) = fresh()
    DedupIndex.build(mk(1L -> "page alpha", 2L -> "page beta"), dir, tbl, nBuckets = 4)
    // a zombie driver double-appends the same survivor rows
    val dup = spark.table(tbl).filter($"keep_id" === 1L)
    dup.write.mode(org.apache.spark.sql.SaveMode.Append).format("parquet").insertInto(tbl)
    assert(spark.table(tbl).count() == 3)
    DedupIndex.compact(spark, tbl, dir)
    assert(spark.table(tbl).count() == 2, "duplicate hash rows retired")
    assert(DedupIndex.filterNew(spark, tbl, mk(10L -> "PAGE ALPHA", 11L -> "page gamma"))
      .select($"doc_id").as[Long].collect().toSet == Set(11L))
  }

  test("delete: content unseen after takedown, re-ingest is new, compact retires physically") {
    val (dir, tbl) = fresh()
    DedupIndex.build(mk(1L -> "kept page", 2L -> "doomed page"), dir, tbl, nBuckets = 4)
    // 99 was never a keeper — deleting it is a no-op, not an error
    assert(DedupIndex.delete(spark, tbl, Seq(2L, 99L).toDF("doc_id")) == 1L)
    // the deleted content is no longer "seen"; kept content still is
    assert(DedupIndex.filterNew(spark, tbl, mk(10L -> "DOOMED page", 11L -> "kept page"))
      .select($"doc_id").as[Long].collect().toSet == Set(10L))
    // re-ingest of the deleted content behaves as NEW: one survivor appends...
    assert(DedupIndex.ingest(spark, tbl, mk(20L -> "doomed page"))
      .select($"doc_id").as[Long].collect().toSet == Set(20L))
    // ...and is immediately seen again under its new keeper
    assert(DedupIndex.filterNew(spark, tbl, mk(30L -> "doomed  PAGE")).isEmpty)
    // compact: the tombstoned row is physically gone, the re-ingested
    // keeper survives (the anti-join runs BEFORE the keep-id min, so
    // the deleted keeper cannot resurrect through the merge)
    DedupIndex.compact(spark, tbl, dir)
    assert(spark.table(tbl).select($"keep_id").as[Long].collect().toSet == Set(1L, 20L))
    assert(!spark.catalog.tableExists(DedupIndex.tombstonesTable(tbl)),
      "compact must clear the retired tombstones")
    // post-compact behavior unchanged
    assert(DedupIndex.filterNew(spark, tbl, mk(40L -> "doomed page", 41L -> "brand new"))
      .select($"doc_id").as[Long].collect().toSet == Set(41L))
  }

  test("hot duplicate class: 200k copies ingest without a window, closed-form result") {
    val (dir, tbl) = fresh()
    DedupIndex.build(mk(1L -> "seed"), dir, tbl, nBuckets = 4)
    val hot = spark.range(200000).select(
      ($"id" + 100L).as("doc_id"),
      when($"id" =!= 0L, lit("the mega duplicated page"))
        .otherwise(concat(lit("unique "), $"id")).as("text"))
    val out = DedupIndex.filterNew(spark, tbl, hot)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    val got = out.select($"doc_id", $"n_dups").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 1L), (101L, 199999L)))
  }
}
