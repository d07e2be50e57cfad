package graft

import graft.ops.{Bm25, Bm25Index}
import graft.sources.SwapHooks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted BM25 index: bit-identity with the one-shot operator
  * (build, EXACT append, probe-time k1/b retuning, shard merge), the
  * serving tier's takedown contract (immediate invisibility, stats
  * retired at compact), the zero-downtime rebuild contract, and the
  * single-writer lock.
  */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_bm25idx").toString

  /** Deterministic corpus with shared vocabulary, varied lengths and
    * tf skew, so rankings are non-trivial.
    */
  private def corpus(ids: Range): DataFrame = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    ids.map { i =>
      val n = 3 + (i * 7) % 9
      val text = (0 until n).map(j => words((i * 3 + j * j) % words.length)).mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  private def queries: DataFrame = Seq(
    (900L, "alpha delta"), (901L, "kappa"), (902L, "theta beta iota"))
    .toDF("query_id", "text")

  private def collectTop(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select($"query_id", $"doc_id", $"rank", $"score_micro")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def oneShot(d: DataFrame, k: Int, k1: Double = 1.5, b: Double = 0.75) =
    collectTop(Bm25.topDocs(d, queries, k, k1, b))

  test("build + probe is bit-identical to the one-shot operator") {
    val dir = tmpDir()
    val d = corpus(0 until 60)
    assert(Bm25Index.build(d, dir, nTb = 8) == 60L)
    val got = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(got == oneShot(d, 5), s"index probe != one-shot")
    assert(got.nonEmpty)
  }

  test("append is EXACT: build(head) + append(tail) == one-shot over the union") {
    val dir = tmpDir()
    val all = corpus(0 until 80)
    Bm25Index.build(all.filter($"doc_id" < 50), dir, nTb = 8)
    assert(Bm25Index.append(spark, dir, all.filter($"doc_id" >= 50)) == 30L)
    val got = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5))
    assert(got == oneShot(all, 5),
      "appended index must answer bit-identically to a union build")
  }

  test("k1/b are probe-time knobs over the same stored tables") {
    val dir = tmpDir()
    val d = corpus(0 until 40)
    Bm25Index.build(d, dir, nTb = 4)
    val tuned = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5, k1 = 1.2, b = 0.5))
    assert(tuned == oneShot(d, 5, k1 = 1.2, b = 0.5))
    assert(tuned != oneShot(d, 5), "retuning should move at least one score")
  }

  test("delete: immediate invisibility with full-corpus stats; compact retires the stats") {
    val dir = tmpDir()
    val d = corpus(0 until 60)
    Bm25Index.build(d, dir, nTb = 8)
    // k > corpus size: every candidate appears, so the pre/post score
    // comparison below never hits a truncation boundary.
    val full = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 100))
    val victims = full.map(_._2).take(3)
    assert(Bm25Index.delete(spark, dir, victims.toSeq.toDF("doc_id")) == victims.size.toLong)
    // Redelivered takedown + absent ids: counted-once no-op.
    assert(Bm25Index.delete(spark, dir,
      (victims.toSeq ++ Seq(123456L)).toDF("doc_id")) == 0L)
    val after = Bm25Index.topDocs(spark, dir, queries, k = 100)
    val afterSet = collectTop(after)
    assert(afterSet.map(_._2).intersect(victims).isEmpty, "tombstoned docs still returned")
    // Between delete and compact, scores keep the FULL corpus stats:
    // surviving (query, doc) scores are unchanged from the full run.
    val fullScores = full.map(t => (t._1, t._2) -> t._4).toMap
    assert(afterSet.forall(t => fullScores((t._1, t._2)) == t._4),
      "pre-compact scores must keep full-corpus df/avgdl/N")
    // After compact, scores equal a fresh build on the survivors.
    val survivors = d.filter(!$"doc_id".isin(victims.toSeq: _*))
    Bm25Index.compact(spark, dir)
    val compacted = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 100))
    assert(compacted == collectTop(Bm25.topDocs(survivors, queries, k = 100)),
      "post-compact scores must equal a fresh build on the surviving corpus")
  }

  test("compact collapses appended small files and stat deltas") {
    val dir = tmpDir()
    val all = corpus(0 until 60)
    Bm25Index.build(all.filter($"doc_id" < 20), dir, nTb = 4)
    Bm25Index.append(spark, dir, all.filter($"doc_id" >= 20 && $"doc_id" < 40))
    Bm25Index.append(spark, dir, all.filter($"doc_id" >= 40))
    val before = Bm25Index.stats(spark, dir)
    assert(before.statDeltas == 3L, s"expected 3 stat deltas, got $before")
    Bm25Index.compact(spark, dir)
    val after = Bm25Index.stats(spark, dir)
    assert(after.statDeltas == 1L)
    assert(after.dataFiles < before.dataFiles,
      s"compact should shrink the file count: $before -> $after")
    assert(after.docs == 60L)
    assert(collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5)) == oneShot(all, 5))
  }

  test("merge folds a shard in exactly: merged == one-shot over the union") {
    val dirA = tmpDir(); val dirB = tmpDir()
    val all = corpus(0 until 80)
    Bm25Index.build(all.filter($"doc_id" < 40), dirA, nTb = 8)
    Bm25Index.build(all.filter($"doc_id" >= 40), dirB, nTb = 4) // different bucketing
    assert(Bm25Index.merge(spark, dirA, dirB) == 40L)
    val got = collectTop(Bm25Index.topDocs(spark, dirA, queries, k = 5))
    assert(got == oneShot(all, 5), "merged index must equal a union build")
  }

  test("merge honors the other shard's tombstones") {
    val dirA = tmpDir(); val dirB = tmpDir()
    val all = corpus(0 until 60)
    Bm25Index.build(all.filter($"doc_id" < 30), dirA, nTb = 4)
    Bm25Index.build(all.filter($"doc_id" >= 30), dirB, nTb = 4)
    Bm25Index.delete(spark, dirB, Seq(35L, 36L).toDF("doc_id"))
    assert(Bm25Index.merge(spark, dirA, dirB) == 28L)
    val got = collectTop(Bm25Index.topDocs(spark, dirA, queries, k = 50))
    val expected = collectTop(
      Bm25.topDocs(all.filter(!$"doc_id".isin(35L, 36L)), queries, k = 50))
    assert(got == expected)
  }

  test("rebuild: probe between staging write and swap serves the OLD generation") {
    val dir = tmpDir()
    val genA = corpus(0 until 30)
    val genB = corpus(1000 until 1030)
    Bm25Index.build(genA, dir, nTb = 4)
    def probe() = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5))
    val before = probe()
    assert(before.forall(_._2 < 30L))
    var hooked = Option.empty[Set[(Long, Long, Long, Long)]]
    SwapHooks.preSwap = _ => { if (hooked.isEmpty) hooked = Some(probe()) }
    try Bm25Index.build(genB, dir, nTb = 4)
    finally SwapHooks.preSwap = _ => ()
    assert(hooked.contains(before),
      s"mid-rebuild probe must serve the old complete generation")
    assert(probe().forall(_._2 >= 1000L), "post-swap probe must serve the new generation")
  }

  test("rebuild clears the previous generation's tombstones") {
    val dir = tmpDir()
    val d = corpus(0 until 30)
    Bm25Index.build(d, dir, nTb = 4)
    val victim = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 1)).head._2
    Bm25Index.delete(spark, dir, Seq(victim).toDF("doc_id"))
    Bm25Index.build(d, dir, nTb = 4) // every given doc live again
    val got = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 50))
    assert(got.exists(_._2 == victim), "rebuild must clear old tombstones")
  }

  test("mutators fail loudly under a held writer lock; probes never lock") {
    val dir = tmpDir()
    val d = corpus(0 until 20)
    Bm25Index.build(d, dir, nTb = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = graft.sources.WriterLock.lockPath(dir)
    val out = fs.create(lock, false)
    out.write("someone-else".getBytes("UTF-8")); out.close()
    try {
      intercept[IllegalStateException] {
        Bm25Index.append(spark, dir, corpus(20 until 25))
      }
      // probes never take the lock
      assert(collectTop(Bm25Index.topDocs(spark, dir, queries, k = 3)).nonEmpty)
    } finally fs.delete(lock, false)
  }

  test("filtered search: scan-level metadata predicate, global stats") {
    val dir = tmpDir()
    val d = corpus(0 until 60)
      .withColumn("lang", when($"doc_id" % 3 === 0, "en").otherwise("de"))
    Bm25Index.build(d, dir, nTb = 8, metaCols = Seq("lang"))
    val unfiltered = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 100))
    val filtered = collectTop(Bm25Index.topDocs(spark, dir, queries, k = 100,
      filter = Some($"lang" === "en")))
    assert(filtered.nonEmpty)
    assert(filtered.forall(_._2 % 3 == 0), "filter must exclude non-matching docs")
    // Global stats: surviving docs keep their unfiltered scores, so the
    // filtered result IS the unfiltered ranking minus non-matching docs
    // (re-ranked among survivors).
    val unfScores = unfiltered.map(t => (t._1, t._2) -> t._4).toMap
    assert(filtered.forall(t => unfScores((t._1, t._2)) == t._4),
      "filtered scores must keep global df/avgdl/N")
    // The predicate reaches the parquet scan (pushed, not post-join).
    val plan = Bm25Index.topDocs(spark, dir, queries, k = 5,
      filter = Some($"lang" === "en")).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(lang,en)"),
      s"metadata filter not pushed into the scan:\n$plan")
  }

  test("metadata columns carried by append and merge; missing meta fails loudly") {
    val dirA = tmpDir(); val dirB = tmpDir()
    val all = corpus(0 until 60)
      .withColumn("lang", when($"doc_id" % 3 === 0, "en").otherwise("de"))
    Bm25Index.build(all.filter($"doc_id" < 30), dirA, nTb = 4, metaCols = Seq("lang"))
    intercept[IllegalArgumentException] {
      Bm25Index.append(spark, dirA, corpus(30 until 40)) // no lang column
    }
    Bm25Index.append(spark, dirA, all.filter($"doc_id" >= 30 && $"doc_id" < 40))
    Bm25Index.build(all.filter($"doc_id" >= 40), dirB, nTb = 4, metaCols = Seq("lang"))
    Bm25Index.merge(spark, dirA, dirB)
    val filtered = collectTop(Bm25Index.topDocs(spark, dirA, queries, k = 100,
      filter = Some($"lang" === "en")))
    assert(filtered.map(_._2).exists(_ >= 40L), "merged docs must be filterable")
    assert(filtered.forall(_._2 % 3 == 0))
    // and the filtered ranking equals post-filtering the one-shot union scores
    val expected = collectTop(Bm25.topDocs(all, queries, k = 1000))
      .filter(_._2 % 3 == 0)
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.toSeq.sortBy(r => (-r._4, r._2)).zipWithIndex
          .map { case ((q, doc, _, s), i) => (q, doc, (i + 1).toLong, s) }
      }.toSet
    assert(filtered == expected.filter(_._3 <= 100))
  }

  test("maxDfFrac drops ubiquitous terms: equal to querying without them") {
    val dir = tmpDir()
    // "omni" appears in EVERY doc; the real signal terms do not.
    val d = corpus(0 until 40)
      .withColumn("text", concat($"text", lit(" omni")))
    Bm25Index.build(d, dir, nTb = 4)
    val qWith = Seq((900L, "alpha delta omni")).toDF("query_id", "text")
    val qWithout = Seq((900L, "alpha delta")).toDF("query_id", "text")
    val capped = collectTop(Bm25Index.topDocs(spark, dir, qWith, k = 100, maxDfFrac = 0.9))
    val stripped = collectTop(Bm25Index.topDocs(spark, dir, qWithout, k = 100))
    assert(capped == stripped,
      "capping an omnipresent term must equal removing it from the query")
    val uncapped = collectTop(Bm25Index.topDocs(spark, dir, qWith, k = 100))
    assert(uncapped != capped, "the cap should change scores by the dropped contribution")
  }

  test("probe plan prunes to the query terms' buckets and pushes the term filter") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 60), dir, nTb = 16)
    val plan = Bm25Index.topDocs(spark, dir, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in plan:\n$plan")
    // The probed-bucket isin must reach the scan (tb is the partition
    // column); 6 distinct query terms can touch at most 6 of 16 buckets.
    assert("tb#\\d+[L]? IN".r.findFirstIn(plan).isDefined ||
      plan.contains("tb") && plan.contains(" IN "),
      s"tb isin filter missing from plan:\n$plan")
    // The pushed term filter must reach the parquet reader: postings
    // are term-sorted within each file, so In(term, ...) is what buys
    // row-group skipping inside a probed bucket.
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term In filter not pushed into the postings scan:\n$plan")
  }

  test("postings land term-sorted within every file (the row-group-skip layout)") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 60), dir, nTb = 2)
    Bm25Index.append(spark, dir, corpus(60 until 80))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(Bm25Index.postingsPath(dir)))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("tb="))
      .flatMap(td => fs.listStatus(td.getPath))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    assert(files.nonEmpty)
    files.foreach { st =>
      val terms = spark.read.parquet(st.getPath.toString)
        .select($"term").as[String].collect()
      assert(terms.sameElements(terms.sorted),
        s"postings in ${st.getPath} are not term-sorted")
    }
  }

  test("empty build fails loudly, not with a later schema-inference error") {
    val dir = tmpDir()
    val e = intercept[IllegalArgumentException] {
      Bm25Index.build(corpus(0 until 0), dir, nTb = 4)
    }
    assert(e.getMessage.contains("empty BM25 index"), e.getMessage)
    // a failed build leaves no half-index behind
    intercept[IllegalStateException] {
      Bm25Index.topDocs(spark, dir, queries, k = 1)
    }
  }

  test("compacting every doc away fails loudly and leaves the index serving") {
    val dir = tmpDir()
    val d = corpus(0 until 10)
    Bm25Index.build(d, dir, nTb = 4)
    Bm25Index.delete(spark, dir, d.select($"doc_id"))
    val e = intercept[IllegalStateException] { Bm25Index.compact(spark, dir) }
    assert(e.getMessage.contains("zero live docs"), e.getMessage)
    // the refused compact must not have touched the generation: probes
    // still serve (and still honor the tombstones)
    assert(collectTop(Bm25Index.topDocs(spark, dir, queries, k = 5)).isEmpty)
    assert(Bm25Index.stats(spark, dir).tombstones == 10L)
  }

  test("stats.terms: exact vocabulary as delta sums through every mutator") {
    val dir = tmpDir(); val shard = tmpDir()
    Bm25Index.build(
      Seq((0L, "alpha beta"), (1L, "beta gamma")).toDF("doc_id", "text"), dir, nTb = 4)
    assert(Bm25Index.stats(spark, dir).terms == 3L) // {alpha, beta, gamma}
    Bm25Index.append(spark, dir, Seq((2L, "beta delta")).toDF("doc_id", "text"))
    assert(Bm25Index.stats(spark, dir).terms == 4L) // + delta only
    Bm25Index.build(
      Seq((10L, "epsilon alpha"), (11L, "zeta")).toDF("doc_id", "text"), shard, nTb = 8)
    Bm25Index.merge(spark, dir, shard)
    assert(Bm25Index.stats(spark, dir).terms == 6L) // + epsilon, zeta
    // takedown of zeta's only holder: like df, the vocabulary keeps the
    // term until compact physically retires it
    Bm25Index.delete(spark, dir, Seq(11L).toDF("doc_id"))
    assert(Bm25Index.stats(spark, dir).terms == 6L)
    Bm25Index.compact(spark, dir)
    assert(Bm25Index.stats(spark, dir).terms == 5L)
    assert(Bm25Index.stats(spark, dir).docs == 4L)
  }

  test("stats on a pre-vocab-delta layout falls back to a dfd distinct count") {
    val dir = tmpDir()
    Bm25Index.build(
      Seq((0L, "alpha beta"), (1L, "beta gamma")).toDF("doc_id", "text"), dir, nTb = 4)
    // simulate the pre-upgrade 2-column stats/ table
    val legacy = spark.read.parquet(Bm25Index.statsPath(dir))
      .select($"n_docs", $"sum_dl").as[(Long, Long)].collect().toSeq
    legacy.toDF("n_docs", "sum_dl").repartition(1)
      .write.mode("overwrite").parquet(Bm25Index.statsPath(dir))
    val s = Bm25Index.stats(spark, dir) // must not throw on the missing column
    assert(s.docs == 2L && s.terms == 3L, s"$s")
    // mutators still refuse loudly (appending 3-column deltas beside
    // 2-column ones would corrupt every later stats read)
    val e = intercept[IllegalArgumentException] {
      Bm25Index.append(spark, dir, Seq((2L, "delta")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("n_terms"), e.getMessage)
  }

  test("rebuilding a live index with a different nTb fails loudly") {
    val dir = tmpDir()
    Bm25Index.build(corpus(0 until 20), dir, nTb = 4)
    val e = intercept[IllegalArgumentException] {
      Bm25Index.build(corpus(0 until 20), dir, nTb = 8)
    }
    assert(e.getMessage.contains("nTb"), e.getMessage)
    // same nTb rebuilds fine; the index still answers
    Bm25Index.build(corpus(0 until 20), dir, nTb = 4)
    assert(collectTop(Bm25Index.topDocs(spark, dir, queries, k = 3)).nonEmpty)
  }
}
