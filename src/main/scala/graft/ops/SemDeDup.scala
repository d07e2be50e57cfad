package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): cluster the embedding space with k-means, then
  * search for duplicate pairs ONLY within each cluster — the cluster
  * assignment is the candidate generator, replacing LSH bucketing
  * ([[Similarity.embeddingNearDuplicates]]) with a data-adaptive
  * partition of the space.
  *
  * Scale shape: with the auto cell count k ~ sqrt(N) (cell size ~
  * sqrt(N)), total candidate work is sum(cellSize^2) ~ N — linear, not
  * all-pairs. Clustering itself is the bounded [[Clustering.kmeans]]
  * loop (broadcast centers + one shuffle per iteration). Cells larger
  * than `maxCell` are DROPPED from pair generation, exactly like the
  * LSH path's `maxBucket` guard ([[Dedup.lshCandidatePairs]]): a
  * degenerate corpus that collapses into one cell would otherwise
  * self-join quadratically. The documented tradeoff is recall on such
  * cells, never a quadratic blowup. Candidates are verified against the
  * TRUE cosine (codegen [[Similarity.cosineCol]]) before thresholding,
  * so emitted pairs are never false positives — the cell restriction
  * only affects recall.
  *
  * The keeper policy follows the paper: from each duplicate group keep
  * the example with the LOWEST cosine to its cluster centroid (the most
  * "edge-of-cluster", diversity-preserving representative), ties broken
  * by min id.
  */
object SemDeDup {

  /** Verified duplicate pairs and the post-dedup survivors from ONE
    * clustering pass. `pairs`: (id_a, id_b, cos, cell) with id_a < id_b,
    * cos rounded to 4 decimals, `cell` the shared cluster index.
    * `survivors`: the input rows minus removed duplicates. Both are
    * deterministic end to end ([[Clustering.kmeans]] is deterministic
    * by construction).
    *
    * `nClusters <= 0` = auto ~sqrt(N) cells; pass `nTotal` when the
    * corpus size is already known to skip the count() action.
    */
  def run(
      embs: DataFrame,
      threshold: Double = 0.95,
      nClusters: Int = 0,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCell: Int = 1 << 14,
      nTotal: Long = 0L): (DataFrame, DataFrame) = {
    val spark = embs.sparkSession
    import spark.implicits._
    require(maxCell >= 2, s"maxCell must admit at least one pair: $maxCell")

    val kCells =
      if (nClusters > 0) nClusters
      else {
        val n = if (nTotal > 0L) nTotal else embs.count()
        math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong).min(1 << 20).toInt
      }
    val (assigned, centers) = Clustering.kmeans(embs, kCells, iters, idCol, vecCol)
    // One clustering pass feeds pair generation AND keeper scoring;
    // localCheckpoint truncates the iterate lineage so neither consumer
    // replays the k-means loop.
    val vecs = embs
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .join(assigned, "vec_id")
      .localCheckpoint()

    // Cell-size guard BEFORE the self-join (broadcast-joined — at most
    // kCells rows): oversized cells never reach the pair generator, so
    // per-cell candidate volume is bounded by maxCell^2 by construction.
    val keepCells = vecs.groupBy($"cluster").agg(count(lit(1)).as("csz"))
      .filter($"csz".between(2, maxCell))
      .select($"cluster")
    val inCell = vecs.join(broadcast(keepCells), "cluster")
    val l = inCell.select($"cluster", $"vec_id".as("id_a"), $"v".as("vec_a"))
    val r = inCell.select($"cluster", $"vec_id".as("id_b"), $"v".as("vec_b"))
    val pairs = l.join(r, "cluster")
      .filter($"id_a" < $"id_b")
      .withColumn("cos", Similarity.cosineCol(spark, $"vec_a", $"vec_b"))
      .filter($"cos" >= threshold)
      .select($"id_a", $"id_b", round($"cos", 4).as("cos"), $"cluster".as("cell"))

    val comps = Dedup.connectedComponents(
      pairs.select($"id_a".as("doc_a"), $"id_b".as("doc_b")))

    // Keeper score: cosine to the member's OWN cell centroid (centers
    // are tiny — k * dim floats, broadcast). Keep the minimum per
    // component; everything else in the component is removed.
    val bc = spark.sparkContext.broadcast(centers.map(_.map(_.toFloat)))
    val centSim = udf { (v: Seq[Float], c: Int) =>
      Similarity.cosine(bc.value(c), v)
    }
    val keepers = comps
      .join(vecs.select($"vec_id".as("doc_id"), $"v", $"cluster"), "doc_id")
      .withColumn("csim", round(centSim($"v", $"cluster"), 6))
      .groupBy($"rep_id")
      .agg(min_by(struct($"csim", $"doc_id"), struct($"csim", $"doc_id")).as("kp"))
      .select($"kp.doc_id".as("doc_id"))
    val removed = comps.select($"doc_id")
      .join(keepers, Seq("doc_id"), "left_anti")
      .withColumnRenamed("doc_id", "__rm_id")

    val survivors = embs.join(
      removed, col(idCol).cast("long") === col("__rm_id"), "left_anti")
    (pairs, survivors)
  }

  /** Cosine >= `threshold` duplicate pairs restricted to k-means cells.
    * See [[run]] for the output shape and scale notes.
    */
  def semanticDuplicatePairs(
      embs: DataFrame,
      threshold: Double = 0.95,
      nClusters: Int = 0,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCell: Int = 1 << 14,
      nTotal: Long = 0L): DataFrame =
    run(embs, threshold, nClusters, iters, idCol, vecCol, maxCell, nTotal)._1

  /** Survivors after semantic deduplication: duplicate groups are the
    * connected components of the pair graph; each group keeps its
    * lowest-centroid-cosine member. See [[run]].
    */
  def semanticDeduplicate(
      embs: DataFrame,
      threshold: Double = 0.95,
      nClusters: Int = 0,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCell: Int = 1 << 14,
      nTotal: Long = 0L): DataFrame =
    run(embs, threshold, nClusters, iters, idCol, vecCol, maxCell, nTotal)._2
}
