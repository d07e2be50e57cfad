package graft

import graft.ops.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** Filtered ANN search: metadata columns stored beside the vectors
  * (and inside the PQ sidecar), probe-time predicates applied at the
  * scan. Exactness contract: at nProbe = cell count (and, for the PQ
  * path, a refine budget past the filtered corpus) the filtered probe
  * equals brute force over the predicate's rows.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int = 16, seed: Int = 5) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1), i % 4, if (i % 2 == 0) "en" else "de"))
      .toDF("vec_id", "embedding", "label", "lang")
  }

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_annflt").toString

  test("topK filter == brute force over the filtered corpus at full probe depth") {
    val e = vecs(400)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 8, iters = 2, metaCols = Seq("label", "lang"))
    val q = e.filter($"vec_id" < 10)
    val got = AnnIndex.topK(spark, dir, q, k = 5, nProbe = 8,
      filter = Some($"label" === 2 && $"lang" === "en"))
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    // Brute force replaying topK's OWN contract (same cosine kernel,
    // round-before-rank, ties by neighbor_id) over the pre-filtered
    // corpus — bit-deterministic equality, no cross-kernel ulp noise.
    val want = Similarity.rankTopK(
      e.filter($"label" === 2 && $"lang" === "en")
        .select($"vec_id".as("neighbor_id"), $"embedding".as("nv"))
        .crossJoin(q.select($"vec_id".as("query_id"), $"embedding".as("qv")))
        .filter($"query_id" =!= $"neighbor_id")
        .select($"query_id", $"neighbor_id",
          round(Similarity.cosineCol(spark, $"qv", $"nv"), 4).as("score")), 5)
      .select($"query_id", $"neighbor_id", $"rank".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"filtered probe diverged from brute force:\n got=$got\n want=$want")
    // every returned neighbor satisfies the predicate
    val ids = got.map(_._2)
    val legal = e.filter($"label" === 2 && $"lang" === "en")
      .select($"vec_id").as[Long].collect().toSet
    assert(ids.subsetOf(legal))
  }

  test("topKPq filter == brute force when refine exceeds the filtered corpus") {
    val e = vecs(400, seed = 11)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 8, iters = 2, metaCols = Seq("label"))
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    val q = e.filter($"vec_id" < 10).select($"vec_id", $"embedding")
    val got = AnnIndex.topKPq(spark, dir, q, k = 5, nProbe = 8, refine = 200,
      filter = Some($"label" === 1))
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    // topKPq's final rank is on the UNROUNDED exact cosine — replay
    // with an unrounded brute force over the filtered rows.
    val filtered = e.filter($"label" === 1)
    val want = Similarity.rankTopK(
      filtered.select($"vec_id".as("neighbor_id"), $"embedding".as("nv"))
        .crossJoin(q.select($"vec_id".as("query_id"), $"embedding".as("qv")))
        .filter($"query_id" =!= $"neighbor_id")
        .select($"query_id", $"neighbor_id",
          Similarity.cosineCol(spark, $"qv", $"nv").as("score")), 5)
      .select($"query_id", $"neighbor_id", $"rank".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"filtered PQ probe diverged:\n got=$got\n want=$want")
  }

  test("append and streaming ingest carry the metadata; filters see appended rows") {
    val e = vecs(200, seed = 7)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 4, iters = 2, metaCols = Seq("label", "lang"))
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    // a batch appended after the build is visible to a filtered probe
    val batch = vecs(220, seed = 7).filter($"vec_id" >= 200)
    AnnIndex.append(spark, dir, batch)
    val q = e.filter($"vec_id" === 0L)
    val got = AnnIndex.topK(spark, dir, q, k = 200, nProbe = 4,
      filter = Some($"vec_id" >= 200 && $"label" === 2))
      .select($"neighbor_id").as[Long].collect().toSet
    val expected = batch.filter($"label" === 2).select($"vec_id").as[Long].collect().toSet
    // full probe depth (4 cells) + k past the filtered size = every
    // appended row matching the predicate must surface
    assert(got == expected, s"appended+filtered mismatch: got=$got want=$expected")
    // pqcodes carries the metadata for the appended rows too
    val pqMeta = spark.read.parquet(AnnIndex.pqcodesPath(dir))
      .filter($"vec_id" >= 200 && $"label" === 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(pqMeta == expected)
  }

  test("a batch missing the index's metadata columns fails loudly") {
    val e = vecs(100, seed = 3)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 4, iters = 2, metaCols = Seq("label"))
    val bare = vecs(120, seed = 3).filter($"vec_id" >= 100)
      .select($"vec_id", $"embedding")
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, dir, bare)
    }
    assert(ex.getMessage.contains("label"), ex.getMessage)
  }

  test("metaCols colliding with index columns are rejected") {
    val e = vecs(50)
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.build(e, tmpDir(), nClusters = 4, iters = 1, metaCols = Seq("cell"))
    }
    assert(ex.getMessage.contains("collide"), ex.getMessage)
  }

  test("compact preserves metadata and filtered answers (tombstone retirement path)") {
    val e = vecs(300, seed = 13)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 8, iters = 2, metaCols = Seq("label"))
    AnnIndex.buildPq(spark, dir, m = 4, codes = 8, iters = 2)
    AnnIndex.delete(spark, dir, Seq(5L, 6L).toDF("vec_id"))
    val q = e.filter($"vec_id" < 5)
    val before = AnnIndex.topK(spark, dir, q, k = 5, nProbe = 8,
      filter = Some($"label" === 3))
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    AnnIndex.compact(spark, dir) // tombstones force a whole-tree rewrite
    val after = AnnIndex.topK(spark, dir, q, k = 5, nProbe = 8,
      filter = Some($"label" === 3))
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(before == after, "filtered answers changed across compact")
    // schema survived the rewrite in both trees
    assert(spark.read.parquet(AnnIndex.vectorsPath(dir)).columns.contains("label"))
    assert(spark.read.parquet(AnnIndex.pqcodesPath(dir)).columns.contains("label"))
  }

  test("metadata filter reaches the parquet scan: pushed filter + partition pruning") {
    val e = vecs(400, seed = 17)
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 8, iters = 2, metaCols = Seq("label"))
    val q = e.filter($"vec_id" < 5)
    val out = AnnIndex.topK(spark, dir, q, k = 5, nProbe = 2,
      filter = Some($"label" === 1))
    out.collect() // force AQE to finalize
    // AQE buries finalized stages inside QueryStageExec nodes whose
    // `plan` is not a child — recurse through them explicitly.
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Nil
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(qs.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      here ++ kids.flatMap(scans)
    }
    // the vectors scan carries BOTH the static cell partition filter
    // and the pushed label data filter — the predicate runs in the
    // reader, not after the join
    val vecScans = scans(out.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("ivf/vectors")))
    assert(vecScans.nonEmpty, "expected a file scan over the vectors table")
    assert(vecScans.forall(_.metadata.get("PushedFilters").exists(_.contains("label"))),
      s"label not pushed: ${vecScans.map(_.metadata.get("PushedFilters"))}")
    assert(vecScans.forall(_.partitionFilters.nonEmpty),
      "probed-cell partition filter missing")
  }

  test("filter on a column the index does not store fails loudly") {
    val e = vecs(100, seed = 9).select($"vec_id", $"embedding")
    val dir = tmpDir()
    AnnIndex.build(e, dir, nClusters = 4, iters = 1)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      AnnIndex.topK(spark, dir, e.filter($"vec_id" < 3), k = 3, nProbe = 4,
        filter = Some(col("label") === 1)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("label"), ex.getMessage)
  }
}
