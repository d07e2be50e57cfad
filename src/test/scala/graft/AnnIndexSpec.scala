package graft

import graft.ops.{AnnIndex, Clustering, Similarity}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Persisted IVF index: row parity with the in-memory ivfTopK built
  * from the same parameters, a recall floor vs exact search, and the
  * partition-pruning contract (the scan must read only probed cells).
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int = 16, seed: Int = 5) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_annidx").toString

  test("delete: tombstoned vector never returned by topK or topKPq; compact retires it") {
    val e = vecs(300, seed = 21)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 8, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    // query 0's nearest neighbor through the full index
    val q = e.filter($"vec_id" === 0L)
    val nn = AnnIndex.topK(spark, dir, q, k = 1, nProbe = 8)
      .select($"neighbor_id").as[Long].head()
    assert(AnnIndex.delete(spark, dir, Seq(nn).toDF("vec_id")) == 1L)
    // neither probe API returns the tombstoned vector anymore
    val viaExact = AnnIndex.topK(spark, dir, q, k = 5, nProbe = 8)
      .select($"neighbor_id").as[Long].collect().toSet
    val viaPq = AnnIndex.topKPq(spark, dir, q, k = 5, nProbe = 8)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(!viaExact.contains(nn) && !viaPq.contains(nn),
      s"deleted $nn still probed back: topK=$viaExact topKPq=$viaPq")
    assert(viaExact.size == 5, "ranking still fills k from live vectors")
    // compact physically retires the row from BOTH trees and clears the set
    AnnIndex.compact(spark, dir)
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).filter($"vec_id" === nn).isEmpty)
    assert(spark.read.parquet(AnnIndex.pqcodesPath(dir)).filter($"vec_id" === nn).isEmpty)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombstones")))
    // answers unchanged after physical retirement
    assert(AnnIndex.topK(spark, dir, q, k = 5, nProbe = 8)
      .select($"neighbor_id").as[Long].collect().toSet == viaExact)
    // a re-appended vector under a fresh id is immediately live again
    val twin = e.filter($"vec_id" === nn)
      .select(($"vec_id" + 7000L).as("vec_id"), $"embedding")
    AnnIndex.append(spark, dir, twin)
    assert(AnnIndex.topK(spark, dir, q, k = 1, nProbe = 8)
      .select($"neighbor_id").as[Long].head() == nn + 7000L)
  }

  test("rebuild invalidates the PQ sidecar and stream markers (generation state)") {
    val e = vecs(200, seed = 31)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 8, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    graft.streaming.StreamingAnnIngest.appendBatch(dir,
      vecs(50, seed = 32).filter($"vec_id" < 3)
        .select(($"vec_id" + 900L).as("vec_id"), $"embedding"), 0L)
    // rebuild: the old codes are laid out by the OLD centers' cell ids
    // — leaving them would make topKPq scan garbage silently
    AnnIndex.build(e, dir, nClusters = 8, iters = 2)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(AnnIndex.pqcodesPath(dir))))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(AnnIndex.codebooksPath(dir))))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_stream_commits")),
      "stale markers would skip a fresh stream's first batches")
    val q = e.filter($"vec_id" === 0L)
    val err = intercept[IllegalStateException] {
      AnnIndex.topKPq(spark, dir, q, k = 1, nProbe = 2).collect()
    }
    assert(err.getMessage.contains("no PQ sidecar"), s"got: ${err.getMessage}")
    // re-running buildPq on the new generation restores the PQ path
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    assert(AnnIndex.topKPq(spark, dir, q, k = 1, nProbe = 8).count() == 1)
  }

  test("compact refuses over an uncommitted streamed batch; proceeds once recovered") {
    val dir = tmpDir()
    AnnIndex.build(vecs(100, seed = 33), dir, nClusters = 8, iters = 2)
    val batch = vecs(10, seed = 34).select(($"vec_id" + 500L).as("vec_id"), $"embedding")
    assert(graft.streaming.StreamingAnnIngest.appendBatch(dir, batch, 3L))
    // simulate the crash window: files installed, marker lost
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_stream_commits/3"), false)
    val err = intercept[IllegalStateException] { AnnIndex.compact(spark, dir) }
    assert(err.getMessage.contains("uncommitted streamed batch"), s"got: ${err.getMessage}")
    // the stream recovers the batch (redelivery replaces), then compact works
    assert(graft.streaming.StreamingAnnIngest.appendBatch(dir, batch, 3L))
    AnnIndex.compact(spark, dir)
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).count() == 110)
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).select("vec_id").distinct().count() == 110)
  }

  test("null query embedding raises instead of silently dropping the query") {
    val dir = tmpDir()
    AnnIndex.build(vecs(80, seed = 35), dir, nClusters = 8, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 2, codes = 4, iters = 1)
    val withNull = Seq(
      (1L, Some(Seq.fill(16)(0.1f))),
      (2L, None)).toDF("vec_id", "embedding")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val err = intercept[Exception] {
      AnnIndex.topKPq(spark, dir, withNull, k = 1, nProbe = 2).collect()
    }
    assert(messages(err).exists(_.contains("null query embedding")),
      s"got: ${messages(err)}")
  }

  test("row parity with ivfTopK under identical build parameters") {
    val e = vecs(400)
    val q = e.filter($"vec_id" < 20)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 16, iters = 3)
    val fromIndex = AnnIndex.topK(spark, dir, q, k = 5, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    val inMemory = Clustering.ivfTopK(e, q, k = 5, nClusters = 16, nProbe = 4, iters = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fromIndex == inMemory)
  }

  test("recall floor vs exact top-k") {
    val e = vecs(500, seed = 9)
    val q = e.filter($"vec_id" < 25)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 16, iters = 3)
    val idx = AnnIndex.topK(spark, dir, q, k = 10, nProbe = 8)
      .select($"query_id", $"neighbor_id")
    val exact = Similarity.topK(e, q, k = 10).select($"query_id", $"neighbor_id")
    val recall = idx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("hits"))
    val mins = recall.agg(min($"hits")).as[Long].head()
    assert(mins >= 5L, s"every query keeps at least half the exact top-10, got min $mins")
  }

  test("the vectors scan carries a partition filter on cell (pruning contract)") {
    val e = vecs(300, seed = 3)
    val q = e.filter($"vec_id" === 0L)
    val dir = tmpDir()
    val cells = AnnIndex.build(e, dir, nClusters = 16, iters = 2)
    assert(cells == 16)
    val out = AnnIndex.topK(spark, dir, q, k = 3, nProbe = 2)
    out.collect() // force AQE to finalize
    // AQE buries finalized stages inside QueryStageExec nodes whose
    // `plan` is not a child — recurse through them explicitly.
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      here ++ kids.flatMap(scans)
    }
    val vectorScans = scans(out.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("vectors")))
    assert(vectorScans.nonEmpty, "expected a file scan over the vectors table")
    assert(vectorScans.forall(_.partitionFilters.nonEmpty),
      "vectors scan must prune by the probed cell set")
    // And the pruning is real: one query probing 2 of 16 cells reads
    // at most 2 partition directories.
    val read = vectorScans.map(_.relation.location.listFiles(
      vectorScans.head.partitionFilters, Nil).length).sum
    assert(read <= 2, s"probed 2 cells but read $read partitions")
  }

  test("PQ sidecar: row parity with ivfPqTopK under identical parameters") {
    val e = vecs(400, seed = 11)
    val q = e.filter($"vec_id" < 20)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 16, iters = 3)
    AnnIndex.buildPq(spark, dir, m = 8, codes = 16, iters = 3)
    val fromIndex = AnnIndex.topKPq(spark, dir, q, k = 5, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    val inMemory = graft.ops.ProductQuantization
      .ivfPqTopK(e, q, k = 5, nClusters = 16, nProbe = 4, m = 8, codes = 16, iters = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fromIndex == inMemory)
  }

  test("PQ sidecar: recall floor vs exact, and the codes scan prunes by cell") {
    val e = vecs(500, seed = 13)
    val q = e.filter($"vec_id" < 25)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 16, iters = 3)
    AnnIndex.buildPq(spark, dir, m = 8, codes = 32, iters = 3)
    val idx = AnnIndex.topKPq(spark, dir, q, k = 10, nProbe = 8)
    val exact = Similarity.topK(e, q, k = 10).select($"query_id", $"neighbor_id")
    val recall = idx.select($"query_id", $"neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("hits"))
    val mins = recall.agg(min($"hits")).as[Long].head()
    assert(mins >= 4L, s"PQ+refine keeps at least 4 of the exact top-10, got min $mins")
    // scores on emitted rows are EXACT cosine (verifiable), not ADC
    val one = idx.as[(Long, Long, Long, Double)].collect().head
    val vm = e.as[(Long, Seq[Float])].collect().toMap
    val want = math.rint(Similarity.cosine(vm(one._1), vm(one._2)) * 1e4) / 1e4
    assert(math.abs(one._4 - want) < 1e-9)
    // pruning: a single query probing 2 cells reads at most 2 pqcode dirs
    val out = AnnIndex.topKPq(spark, dir, e.filter($"vec_id" === 0L), k = 3, nProbe = 2)
    out.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(qs.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      here ++ kids.flatMap(scans)
    }
    val codeScans = scans(out.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("pqcodes")))
    assert(codeScans.nonEmpty && codeScans.forall(_.partitionFilters.nonEmpty),
      "pqcodes scan must prune by the probed cell set")
    val read = codeScans.map(_.relation.location.listFiles(
      codeScans.head.partitionFilters, Nil).length).sum
    assert(read <= 2, s"probed 2 cells but read $read pqcode partitions")
  }

  test("PQ sidecar: append encodes with frozen codebooks; compact collapses pqcodes too") {
    val e = vecs(300, seed = 17)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 8, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 8, codes = 16, iters = 2)
    // append a vector identical to vec 7 under a fresh id — it must be
    // visible to the PQ path immediately (rank-1 hit at cosine 1.0)
    val twin = e.filter($"vec_id" === 7L)
      .select(lit(9001L).as("vec_id"), $"embedding")
    AnnIndex.append(spark, dir, twin)
    val hit = AnnIndex.topKPq(spark, dir, twin, k = 1, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(hit.length == 1 && hit.head._2 == 7L && hit.head._4 == 1.0,
      s"appended twin must find vec 7 through the PQ path: ${hit.toSeq}")
    // grow small files in BOTH trees, then compact collapses both
    (0 until 3).foreach { i =>
      AnnIndex.append(spark, dir,
        e.filter($"vec_id" === i.toLong)
          .select(($"vec_id" + 9100L).as("vec_id"), $"embedding"))
    }
    def files(rootStr: String): Int = {
      val root = new org.apache.hadoop.fs.Path(rootStr)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.getPath.getName.startsWith("cell=")).map { cd =>
        fs.listStatus(cd.getPath).count { st =>
          st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
        }
      }.sum
    }
    val q = e.filter($"vec_id" < 10)
    val before = AnnIndex.topKPq(spark, dir, q, k = 5, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    val (vb, pb) = (files(AnnIndex.vectorsPath(dir)), files(AnnIndex.pqcodesPath(dir)))
    AnnIndex.compact(spark, dir, minFiles = 2)
    val (va, pa) = (files(AnnIndex.vectorsPath(dir)), files(AnnIndex.pqcodesPath(dir)))
    assert(va < vb && pa < pb,
      s"compact must collapse both trees: vectors $vb->$va, pqcodes $pb->$pa")
    assert(AnnIndex.topKPq(spark, dir, q, k = 5, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet == before)
  }

  test("append: new vectors are searchable immediately, assigned like the build would") {
    val e = vecs(300, seed = 21)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 16, iters = 3)
    // Append near-twins of vectors 0..4 under shifted ids.
    val twins = e.filter($"vec_id" < 5)
      .select(($"vec_id" + 1000L).as("vec_id"),
        expr("transform(embedding, x -> x + cast(0.001 as float))").as("embedding"))
    AnnIndex.append(spark, dir, twins)
    val q = e.filter($"vec_id" < 5)
    val got = AnnIndex.topK(spark, dir, q, k = 1, nProbe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { i =>
      assert(got(i) == i + 1000L, s"query $i must retrieve its appended near-twin")
    }
    // Assignment parity: an appended copy of an ORIGINAL vector lands
    // in the same cell the build assigned the original to.
    val cells = spark.read.parquet(AnnIndex.vectorsPath(dir))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val reappend = e.filter($"vec_id" < 5)
      .select(($"vec_id" + 2000L).as("vec_id"), $"embedding")
    AnnIndex.append(spark, dir, reappend)
    val cells2 = spark.read.parquet(AnnIndex.vectorsPath(dir))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    (0L until 5L).foreach { i =>
      assert(cells2(i + 2000L) == cells(i), s"identical vector $i must share its cell")
    }
  }

  test("edges: empty query batch, tiny corpus, nProbe past the cell count") {
    val e = vecs(40, seed = 33)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 4, iters = 2)
    // Empty queries: empty result, no failure.
    assert(AnnIndex.topK(spark, dir, e.filter($"vec_id" < 0), k = 3).count() == 0)
    // nProbe larger than the cell count degrades to a full scan: every
    // query's exact nearest neighbor must then be found.
    val q = e.filter($"vec_id" < 5)
    val full = AnnIndex.topK(spark, dir, q, k = 1, nProbe = 100)
      .select($"query_id", $"neighbor_id")
    val exact = Similarity.topK(e, q, k = 1).select($"query_id", $"neighbor_id")
    assert(full.except(exact).count() == 0 && exact.except(full).count() == 0)
  }

  test("build auto-sizes cells at ~sqrt(N) and persists readable centers") {
    val e = vecs(400, seed = 1)
    val dir = tmpDir()
    val cells = AnnIndex.build(e, dir)
    assert(cells == 20, "ceil(sqrt(400)) = 20")
    val centers = spark.read.parquet(AnnIndex.centersPath(dir))
    assert(centers.count() == 20)
    assert(centers.select(size($"center")).distinct().as[Int].head() == 16)
  }

  test("compact: micro-batch small files collapse, probe rows identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_cmp").toString
    val rnd = new scala.util.Random(51)
    def batch(ids: Range) = ids.map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    AnnIndex.build(batch(0 until 120), dir, nClusters = 4, iters = 2)
    (0 until 6).foreach(b => AnnIndex.append(spark, dir, batch(1000 + b * 10 until 1010 + b * 10)))
    val queries = batch(0 until 10)
    val before = AnnIndex.topK(spark, dir, queries, k = 3, nProbe = 2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    def fileCount = {
      val vecDir = new java.io.File(AnnIndex.vectorsPath(dir))
      vecDir.listFiles().filter(_.getName.startsWith("cell=")).map(cd =>
        cd.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))).sum
    }
    val nBefore = fileCount
    assert(nBefore > 4, s"appends must have fragmented the cells (saw $nBefore files)")
    val after = AnnIndex.compact(spark, dir)
    assert(after.toInt == fileCount)
    assert(fileCount <= 4, s"compaction must collapse to ~one file per cell (saw $fileCount)")
    val got = AnnIndex.topK(spark, dir, queries, k = 3, nProbe = 2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == before, "probe results must be byte-identical across compaction")
    // appends stay searchable after compaction
    AnnIndex.append(spark, dir, batch(2000 until 2005))
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).count() == 185)
  }

  test("excludeSelf=false keeps an id-colliding doc in the ranking (foreign query ids)") {
    val e = vecs(120, seed = 33)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 4, iters = 2)
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    // Query id 7 is NOT corpus row 7 — it carries row 7's exact vector
    // under a colliding id, the foreign-key-space hazard: with the
    // default self-exclusion, doc 7 (its TRUE nearest neighbor, cosine
    // 1.0) silently vanishes from this one query's ranking.
    val q = e.filter($"vec_id" === 7L) // same id, same vector, "different" query
    val withSelf = AnnIndex.topK(spark, dir, q, k = 3, nProbe = 4, excludeSelf = false)
      .select($"neighbor_id", $"rank").as[(Long, Long)].collect().toMap
    assert(withSelf.get(7L).contains(1L),
      s"excludeSelf=false must keep the colliding doc at rank 1: $withSelf")
    val without = AnnIndex.topK(spark, dir, q, k = 3, nProbe = 4)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(!without.contains(7L), "default excludeSelf must keep today's behavior")
    // same contract on the PQ path
    val pqWith = AnnIndex.topKPq(spark, dir, q, k = 3, nProbe = 4, excludeSelf = false)
      .select($"neighbor_id", $"rank").as[(Long, Long)].collect().toMap
    assert(pqWith.get(7L).contains(1L),
      s"topKPq excludeSelf=false must keep the colliding doc at rank 1: $pqWith")
  }

  test("stats/driftStats: appended fraction + center-fit drift, reset by rebuild") {
    val dir = tmpDir()
    val head = vecs(200, seed = 41)
    AnnIndex.build(head, dir, nClusters = 8, iters = 3)
    val s0 = AnnIndex.stats(spark, dir)
    assert(s0.builtRows == 200L && s0.appendedFraction == 0.0,
      s"fresh build: $s0")
    val d0 = AnnIndex.driftStats(spark, dir)
      .getOrElse(fail("fresh build must carry a drift baseline"))
    assert(math.abs(d0.simRatio - 1.0) < 1e-6 && d0.appendedFraction == 0.0,
      s"no-append drift must be ~1.0: $d0")
    assert(d0.buildMeanCenterSim > 0.0,
      "a trained quantizer fits its own corpus with positive mean cosine")
    // append a same-size batch the centers were NEVER trained on: the
    // appended fraction is exact, and the frozen quantizer fits the
    // union worse than its training set (k-means optimized fit there)
    val tail = vecs(400, seed = 77).filter($"vec_id" >= 200)
    AnnIndex.append(spark, dir, tail)
    val s1 = AnnIndex.stats(spark, dir)
    assert(s1.rows == 400L && s1.builtRows == 200L && s1.appendedFraction == 0.5,
      s"post-append: $s1")
    val d1 = AnnIndex.driftStats(spark, dir).get
    assert(d1.appendedFraction == 0.5)
    assert(d1.simRatio < 1.0,
      s"appending untrained rows must lower the center fit: $d1")
    // compact does NOT retrain — the drift baseline survives it
    AnnIndex.delete(spark, dir, Seq(5L).toDF("vec_id"))
    AnnIndex.compact(spark, dir)
    val d2 = AnnIndex.driftStats(spark, dir).get
    assert(d2.builtRows == 200L && d2.rows == 399L,
      s"compact must keep the build baseline: $d2")
    // a REBUILD retrains and resets the series
    AnnIndex.build(vecs(400, seed = 78), dir, nClusters = 8, iters = 3)
    val d3 = AnnIndex.driftStats(spark, dir).get
    assert(d3.builtRows == 400L && d3.appendedFraction == 0.0 &&
      math.abs(d3.simRatio - 1.0) < 1e-6,
      s"rebuild must reset the drift series: $d3")
    // pre-buildinfo generation: stats degrades, driftStats is None
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(AnnIndex.buildinfoPath(dir)), true)
    assert(AnnIndex.driftStats(spark, dir).isEmpty,
      "no baseline -> no drift series (rebuild starts one)")
    val sOld = AnnIndex.stats(spark, dir)
    assert(sOld.builtRows == sOld.rows && sOld.appendedFraction == 0.0,
      s"pre-buildinfo stats must degrade, not throw: $sOld")
  }
}
