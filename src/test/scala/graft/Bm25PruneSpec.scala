package graft

import graft.ops.{Bm25, Bm25Index}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-safety of the MaxScore probe: the pruned path must emit rows
  * BIT-IDENTICAL to the exhaustive path (and to the one-shot operator)
  * on randomized Zipf-ish corpora — across k, k1/b retuning, metadata
  * filters, tombstones, the stopword cap, the Block-Max build flag and
  * its compact-time backfill/drop. The gate var is forced to 0 so
  * spec-sized corpora actually take the pruned path. Route and
  * demotion facts are asserted from [[Bm25Index.ProbeReport]] (the
  * per-call value), never the deprecated racy globals.
  */
class Bm25PruneSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_bm25prune").toString

  private def forced[T](body: => T): T = {
    val oldMin = Bm25Index.PruneMinPostings
    val oldFloor = Bm25Index.PruneFixedCostRows
    Bm25Index.PruneMinPostings = 0L
    Bm25Index.PruneFixedCostRows = 0L
    try body finally {
      Bm25Index.PruneMinPostings = oldMin
      Bm25Index.PruneFixedCostRows = oldFloor
    }
  }

  /** Zipf-ish corpus: 3 near-ubiquitous terms (the MaxScore target — a
    * common term's postings are corpus-sized), 10 mid-frequency, 200
    * rare; lengths vary so dl actually moves the tf saturation.
    */
  private def corpus(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val common = Vector("the", "of", "and")
    val mid = Vector.tabulate(10)(i => s"mid$i")
    val rare = Vector.tabulate(200)(i => s"rare$i")
    (0 until n).map { i =>
      val words =
        Seq.fill(2 + rnd.nextInt(3))(common(rnd.nextInt(common.size))) ++
          Seq.fill(2 + rnd.nextInt(5))(mid(rnd.nextInt(mid.size))) ++
          Seq.fill(1 + rnd.nextInt(3))(rare(rnd.nextInt(rare.size)))
      (i.toLong, rnd.shuffle(words).mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Queries mixing every frequency tier, incl. all-common (worst case
    * for exhaustive scoring) and single-rare (θ comes entirely from
    * one posting list).
    */
  private def queries: DataFrame = Seq(
    (900L, "the mid3 rare17"), (901L, "of and"), (902L, "rare5"),
    (903L, "mid1 mid2 the rare40"), (904L, "and mid7"), (905L, "the of and mid0"),
    (906L, "rare17 rare5 mid3"), (907L, "absentterm the"))
    .toDF("query_id", "text")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select($"query_id", $"doc_id", $"rank", $"score_micro")
      .as[(Long, Long, Long, Long)].collect().toSet

  /** Probe returning (rows, this call's report). */
  private def probed(
      dir: String, qs: DataFrame, k: Int,
      k1: Double = 1.5, b: Double = 0.75,
      filter: Option[org.apache.spark.sql.Column] = None,
      maxDfFrac: Double = 1.0,
      prune: Boolean = true): (Set[(Long, Long, Long, Long)], Bm25Index.ProbeReport) = {
    val (df, rep) = Bm25Index.topDocsWithReport(spark, dir, qs, k, k1 = k1, b = b,
      filter = filter, maxDfFrac = maxDfFrac, prune = prune)
    (rows(df), rep)
  }

  test("pruned == exhaustive == one-shot across seeds and k (default flag-off layout)") {
    for (seed <- Seq(1, 2); k <- Seq(1, 5, 20)) {
      val dir = tmpDir()
      val d = corpus(400, seed)
      Bm25Index.build(d, dir, nTb = 8)
      val (pruned, rep) = forced(probed(dir, queries, k))
      assert(rep.path == "pruned",
        "the spec corpus must actually take the pruned path " +
          s"(took ${rep.path}) — parity would otherwise be vacuous")
      val exhaustive = rows(Bm25Index.topDocs(spark, dir, queries, k, prune = false))
      assert(pruned == exhaustive, s"seed=$seed k=$k pruned != exhaustive")
      assert(pruned == rows(Bm25.topDocs(d, queries, k)), s"seed=$seed k=$k vs one-shot")
      assert(pruned.nonEmpty)
    }
  }

  test("pruned == exhaustive under probe-time k1/b retuning and the stopword cap") {
    val dir = tmpDir()
    Bm25Index.build(corpus(400, 3), dir, nTb = 8, blockMax = true)
    for ((k1, b) <- Seq((1.2, 0.4), (2.0, 1.0), (0.5, 0.0))) {
      val (p, _) = forced(probed(dir, queries, k = 10, k1 = k1, b = b))
      val e = rows(Bm25Index.topDocs(spark, dir, queries, k = 10, k1 = k1, b = b,
        prune = false))
      assert(p == e, s"k1=$k1 b=$b pruned != exhaustive")
    }
    // maxDfFrac drops the common tier entirely; pruning must compose
    val (p, _) = forced(probed(dir, queries, k = 10, maxDfFrac = 0.5))
    val e = rows(Bm25Index.topDocs(spark, dir, queries, k = 10, maxDfFrac = 0.5,
      prune = false))
    assert(p == e, "maxDfFrac + pruning parity")
  }

  test("pruned == exhaustive with a metadata filter and with tombstones") {
    val dir = tmpDir()
    val d = corpus(400, 4)
      .withColumn("lang", when($"doc_id" % 3 === 0, "en").otherwise("de"))
    Bm25Index.build(d, dir, nTb = 8, metaCols = Seq("lang"), blockMax = true)
    val f: Option[org.apache.spark.sql.Column] = Some($"lang" === "en")
    val (pf, _) = forced(probed(dir, queries, k = 10, filter = f))
    val ef = rows(Bm25Index.topDocs(spark, dir, queries, k = 10, filter = f, prune = false))
    assert(pf == ef && pf.forall(_._2 % 3 == 0), "filtered pruning parity")
    Bm25Index.delete(spark, dir, d.filter($"doc_id" % 7 === 0).select($"doc_id"))
    val (pt, _) = forced(probed(dir, queries, k = 10))
    val et = rows(Bm25Index.topDocs(spark, dir, queries, k = 10, prune = false))
    assert(pt == et && pt.forall(_._2 % 7 != 0), "tombstoned pruning parity")
  }

  /** Moderate skew with spam outliers — the Block-Max target: mid-df
    * terms whose GLOBAL (max_tf, min_dl) bound is inflated by a few
    * spammy docs (one term repeated in a short doc), so term-level
    * MaxScore would keep them essential corpus-wide, while most
    * doc-hash blocks are outlier-free and demote them there.
    */
  private def spamCorpus(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val mid = Vector.tabulate(6)(i => s"mid$i")
    val rare = Vector.tabulate(150)(i => s"rare$i")
    (0 until n).map { i =>
      val words =
        if (i % 47 == 0) Seq.fill(8)(mid(rnd.nextInt(mid.size))) // spam
        else
          Seq.fill(3 + rnd.nextInt(3))(mid(rnd.nextInt(mid.size))) ++
            Seq.fill(1 + rnd.nextInt(2))(rare(rnd.nextInt(rare.size))) ++
            Seq.fill(4 + rnd.nextInt(6))(s"pad${rnd.nextInt(3)}")
      (i.toLong, rnd.shuffle(words).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def spamQueries: DataFrame = Seq(
    (900L, "rare3 mid0 mid1 mid2 mid4"), (901L, "rare11 mid1 mid3 mid5 mid0"),
    (902L, "rare40 mid2 mid3 mid4 mid5"), (903L, "rare7 rare9 mid0 mid5 mid1 mid2"))
    .toDF("query_id", "text")

  test("block-granularity demotion occurs and stays rank-safe (parity + one-shot)") {
    for (seed <- Seq(11, 12)) {
      val dir = tmpDir()
      val d = spamCorpus(600, seed)
      Bm25Index.build(d, dir, nTb = 8, blockMax = true)
      val (pruned, rep) = forced(probed(dir, spamQueries, k = 10))
      assert(rep.path == "pruned",
        s"seed=$seed the spam corpus must take the pruned path")
      assert(rep.demotedPairs > 0,
        s"seed=$seed nothing was demoted — the split is vacuous here")
      assert(rep.partialMaskPairs > 0,
        s"seed=$seed no PARTIAL masks — block granularity never engaged " +
          "(every pair was all-or-nothing, i.e. term-level behavior)")
      assert(rep.coverageFallbackTerms == 0,
        s"seed=$seed a clean flag-on build must pass the sidecar coverage cross-check")
      val exhaustive = rows(Bm25Index.topDocs(spark, dir, spamQueries, k = 10,
        prune = false))
      assert(pruned == exhaustive, s"seed=$seed block pruning broke parity")
      assert(pruned == rows(Bm25.topDocs(d, spamQueries, k = 10)),
        s"seed=$seed vs one-shot")
      assert(pruned.nonEmpty)
    }
  }

  test("past PruneMaxQueryPairs the probe routes exhaustive, identical rows") {
    val dir = tmpDir()
    Bm25Index.build(corpus(400, 7), dir, nTb = 8)
    val old = Bm25Index.PruneMaxQueryPairs
    try {
      Bm25Index.PruneMaxQueryPairs = 4L
      val (e, repE) = forced(probed(dir, queries, k = 10))
      assert(repE.path == "exhaustive",
        "a past-budget batch must route exhaustive before any pair collect")
      Bm25Index.PruneMaxQueryPairs = old
      val (p, repP) = forced(probed(dir, queries, k = 10))
      assert(repP.path == "pruned")
      assert(e == p, "the driver-state gate changed the answer")
    } finally Bm25Index.PruneMaxQueryPairs = old
  }

  test("term-granularity fallbacks (past-budget split, pre-sidecar layout) agree") {
    val dir = tmpDir()
    val d = spamCorpus(600, 13)
    Bm25Index.build(d, dir, nTb = 8, blockMax = true)
    val (blockRows, repB) = forced(probed(dir, spamQueries, k = 10))
    assert(repB.path == "pruned")
    // past the block-split budget: one virtual block = r13 term-level
    // MaxScore; partial masks are impossible there by construction
    val old = Bm25Index.BlockSplitMaxPairs
    val (termRows, repT) =
      try {
        Bm25Index.BlockSplitMaxPairs = 0L
        forced(probed(dir, spamQueries, k = 10))
      } finally Bm25Index.BlockSplitMaxPairs = old
    assert(repT.partialMaskPairs == 0,
      "one virtual block cannot partially demote a pair")
    assert(termRows == blockRows, "term-level and block-level answers diverged")
    // simulate an r13 (pre-sidecar) index: meta without n_dblk, no
    // blockmax/ — the probe must fall back to term granularity...
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nTb = Bm25Index.readNTb(spark, dir)
    Seq(nTb).toDF("n_tb").repartition(1)
      .write.mode("overwrite").parquet(Bm25Index.metaPath(dir))
    fs.delete(new org.apache.hadoop.fs.Path(Bm25Index.blockmaxPath(dir)), true)
    val (legacyRows, _) = forced(probed(dir, spamQueries, k = 10))
    assert(legacyRows == blockRows, "pre-sidecar fallback diverged")
    // ...and a mutator must NOT start a partial sidecar on it (absent
    // rows read as "term absent from block" and would break rank
    // safety for every pre-existing posting)
    Bm25Index.append(spark, dir,
      Seq((9000L, "mid0 rare3 freshterm"), (9001L, "mid1 rare11 pad0"))
        .toDF("doc_id", "text"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(Bm25Index.blockmaxPath(dir))),
      "append started a PARTIAL blockmax sidecar on a pre-sidecar index")
    val (appended, _) = forced(probed(dir, spamQueries, k = 10))
    val union = d.unionByName(
      Seq((9000L, "mid0 rare3 freshterm"), (9001L, "mid1 rare11 pad0"))
        .toDF("doc_id", "text"))
    assert(appended == rows(Bm25.topDocs(union, spamQueries, k = 10)),
      "legacy-layout append diverged from the one-shot")
  }

  test("flag-off build: no sidecar; compact(Some(true)) backfills; Some(false) drops") {
    val dir = tmpDir()
    val d = spamCorpus(600, 17)
    Bm25Index.build(d, dir, nTb = 8) // default: no Block-Max sidecar
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bmPath = new org.apache.hadoop.fs.Path(Bm25Index.blockmaxPath(dir))
    assert(!fs.exists(bmPath), "a default build must not write blockmax/")
    assert(Bm25Index.readNDblk(spark, dir).isEmpty,
      "a default build must not declare n_dblk")
    // ...and an append onto it must stay sidecar-less (all-or-nothing)
    Bm25Index.append(spark, dir,
      Seq((9100L, "mid2 rare5 pad1")).toDF("doc_id", "text"))
    assert(!fs.exists(bmPath), "append started a sidecar on a flag-off index")
    val dAll = d.unionByName(Seq((9100L, "mid2 rare5 pad1")).toDF("doc_id", "text"))
    val (offRows, repOff) = forced(probed(dir, spamQueries, k = 10))
    // flag-off = one virtual block: a PARTIAL mask is impossible
    // whichever way the adaptive gate routes (-1 = exhaustive route)
    assert(repOff.partialMaskPairs <= 0,
      "a flag-off index must never engage block granularity")
    assert(offRows == rows(Bm25.topDocs(dAll, spamQueries, k = 10)))
    // the lazy upgrade: ONE compact with the flag flipped backfills
    // the sidecar over the survivors — no rebuild
    Bm25Index.compact(spark, dir, blockMax = Some(true))
    assert(fs.exists(bmPath) && Bm25Index.readNDblk(spark, dir).nonEmpty,
      "compact(Some(true)) must backfill the sidecar")
    val (onRows, repOn) = forced(probed(dir, spamQueries, k = 10))
    assert(repOn.path == "pruned" && repOn.partialMaskPairs > 0,
      "the backfilled sidecar must engage block granularity")
    assert(repOn.coverageFallbackTerms == 0,
      "a backfilled sidecar must pass the coverage cross-check")
    assert(onRows == offRows, "the backfill changed the answer")
    // a default compact PRESERVES the sidecar...
    Bm25Index.compact(spark, dir)
    assert(fs.exists(bmPath) && Bm25Index.readNDblk(spark, dir).nonEmpty,
      "compact(None) must preserve the sidecar state")
    // ...and Some(false) drops it cleanly
    Bm25Index.compact(spark, dir, blockMax = Some(false))
    assert(!fs.exists(bmPath) && Bm25Index.readNDblk(spark, dir).isEmpty,
      "compact(Some(false)) must drop the sidecar")
    val (droppedRows, _) = forced(probed(dir, spamQueries, k = 10))
    assert(droppedRows == offRows, "dropping the sidecar changed the answer")
  }

  test("mixed-version mutation trips the coverage cross-check, stays rank-safe") {
    val dir = tmpDir()
    val d = spamCorpus(600, 19)
    Bm25Index.build(d, dir, nTb = 8, blockMax = true)
    forced(probed(dir, spamQueries, k = 10)) // sanity warm (also caches)
    // Simulate a PRE-SIDECAR binary appending into this upgraded
    // index: hide n_dblk from the mutator (what an old binary's meta
    // read sees — no sidecar write), append, restore the new meta.
    // Postings and dfd now carry the batch; blockmax does not — the
    // silent rank-safety hazard the cross-check exists for.
    val nTb = Bm25Index.readNTb(spark, dir)
    Seq(nTb).toDF("n_tb").repartition(1)
      .write.mode("overwrite").parquet(Bm25Index.metaPath(dir))
    val extra = Seq(
      (9000L, "mid0 mid1 rare3 pad0"), (9001L, "mid2 mid5 rare11 pad1"))
      .toDF("doc_id", "text")
    Bm25Index.append(spark, dir, extra)
    Seq((nTb, Bm25Index.NDblk)).toDF("n_tb", "n_dblk").repartition(1)
      .write.mode("overwrite").parquet(Bm25Index.metaPath(dir))
    val (got, rep) = forced(probed(dir, spamQueries, k = 10))
    // the cross-check runs during block-bound assembly, BEFORE the
    // adaptive gate picks the final route — it must fire either way
    assert(rep.coverageFallbackTerms > 0,
      "uncovered postings must trip the per-term coverage cross-check")
    assert(got == rows(Bm25.topDocs(d.unionByName(extra), spamQueries, k = 10)),
      "coverage fallback must keep the probe rank-safe vs the one-shot")
    assert(got == rows(Bm25Index.topDocs(spark, dir, spamQueries, k = 10,
      prune = false)), "coverage fallback broke pruned/exhaustive parity")
    // compact heals the coverage (sidecar recomputed from survivors)
    Bm25Index.compact(spark, dir)
    val (healed, repH) = forced(probed(dir, spamQueries, k = 10))
    assert(repH.coverageFallbackTerms == 0, "compact must heal sidecar coverage")
    assert(healed == got)
  }

  test("pruned == exhaustive after append and merge (bounds stay exact)") {
    val dir = tmpDir(); val shard = tmpDir()
    val all = corpus(500, 5)
    // flag-on index absorbing a flag-off shard: the merge recomputes
    // the incoming rows' sidecar under THIS index's block function,
    // so the shard's own layout must not matter
    Bm25Index.build(all.filter($"doc_id" < 200), dir, nTb = 8, blockMax = true)
    Bm25Index.append(spark, dir, all.filter($"doc_id" >= 200 && $"doc_id" < 350))
    Bm25Index.build(all.filter($"doc_id" >= 350), shard, nTb = 4)
    Bm25Index.merge(spark, dir, shard)
    val (p, rep) = forced(probed(dir, queries, k = 10))
    assert(rep.coverageFallbackTerms == 0,
      "append+merge on a flag-on index must keep sidecar coverage exact")
    assert(p == rows(Bm25Index.topDocs(spark, dir, queries, k = 10, prune = false)))
    assert(p == rows(Bm25.topDocs(all, queries, k = 10)),
      "bounds through append+merge must stay rank-safe vs the one-shot")
  }
}
