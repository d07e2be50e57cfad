package graft

import graft.ops.SemDeDup
import org.apache.spark.sql.functions._

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  // Base corpus + near-identical twins of every 10th vector (last
  // component zeroed) — the same injection shape q_embed_neardup uses.
  private lazy val withTwins = {
    val twins = embs.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i = size(embedding) - 1 " +
          "THEN cast(0.0 as float) ELSE x END)").as("embedding"))
    embs.select($"vec_id", $"embedding").unionByName(twins)
  }

  test("nClusters=1 equals brute-force pairs; pairs are always a subset") {
    val one = SemDeDup.semanticDuplicatePairs(withTwins, threshold = 0.9,
        nClusters = 1, iters = 0)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = {
      val v = withTwins.select($"vec_id".as("id_a"), $"embedding".as("va"))
      val w = withTwins.select($"vec_id".as("id_b"), $"embedding".as("vb"))
      v.crossJoin(w).filter($"id_a" < $"id_b")
        .withColumn("cos", graft.ops.Similarity.cosineCol(spark, $"va", $"vb"))
        .filter($"cos" >= 0.9)
        .select($"id_a", $"id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(one == brute, "single-cell SemDeDup must equal all-pairs")
    val cells = SemDeDup.semanticDuplicatePairs(withTwins, threshold = 0.9, iters = 3)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cells.subsetOf(brute), "cell-restricted pairs must be a subset of brute force")
    assert(cells.nonEmpty, "twins should be caught")
  }

  test("deduplicate keeps exactly one member of each twin pair it catches") {
    val (pairsDf, survivorsDf) = SemDeDup.run(withTwins, threshold = 0.99, iters = 3)
    val pairs = pairsDf
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val survivors = survivorsDf
      .select($"vec_id").as[Long].collect().toSet
    val caught = pairs.filter { case (a, b) => b == a + 1000000L }
    assert(caught.nonEmpty, "no twin pair was caught at 0.99")
    caught.foreach { case (a, b) =>
      assert(survivors.contains(a) ^ survivors.contains(b),
        s"twin pair ($a, $b): expected exactly one survivor")
    }
    // Nothing outside a duplicate group is ever removed.
    val inPairs = pairs.flatMap { case (a, b) => Seq(a, b) }
    val all = withTwins.select($"vec_id").as[Long].collect().toSet
    assert((all -- survivors).subsetOf(inPairs), "removed a non-duplicate")
  }

  test("deterministic across runs and repartitioning") {
    val p1 = SemDeDup.semanticDuplicatePairs(withTwins, threshold = 0.9, iters = 3)
      .select($"id_a", $"id_b", $"cos").collect().toSet
    val p2 = SemDeDup.semanticDuplicatePairs(withTwins.repartition(7), threshold = 0.9, iters = 3)
      .select($"id_a", $"id_b", $"cos").collect().toSet
    assert(p1 == p2)
  }

  test("maxCell drops degenerate cells instead of joining quadratically") {
    // 300 copies of one vector collapse into a single cell > maxCell.
    val clones = spark.range(300)
      .select($"id".as("vec_id"),
        array((0 until 8).map(i => lit(0.1f * (i + 1))): _*).as("embedding"))
    val capped = SemDeDup.semanticDuplicatePairs(clones, threshold = 0.9,
      nClusters = 1, iters = 0, maxCell = 100)
    assert(capped.isEmpty, "oversized cell must be dropped, not joined")
    val uncapped = SemDeDup.semanticDuplicatePairs(clones, threshold = 0.9,
      nClusters = 1, iters = 0, maxCell = 1000)
    assert(uncapped.count() == 300L * 299 / 2)
  }
}
