package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic k-means over an embedding column, and the IVF
  * (inverted-file) similarity-search path built on it.
  *
  * Determinism by construction, not by seed luck: initial centers are
  * the embeddings of the k ids that sort first under the portable
  * [[Sampling.hashKey]] order (a reproducible pseudo-random draw), and
  * Lloyd iterations run a FIXED number of rounds — identical clusters
  * on every run, partitioning, and cluster size, which is what makes
  * IVF recall testable as a hard contract.
  *
  * Scale shape per iteration: centers broadcast (k * dim doubles),
  * assignment is one map over the corpus, recomputation is one
  * groupBy(cluster, dim) shuffle of per-dimension partial sums — no
  * all-pairs anything, no driver loop over rows. Empty clusters keep
  * their previous center (standard Lloyd fallback).
  */
object Clustering {

  /** (vec_id, cluster) assignment plus the final centers.
    * `embs`: (idCol, vecCol array<float>).
    */
  def kmeans(
      embs: DataFrame,
      k: Int,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, Array[Array[Double]]) = {
    require(k >= 1 && iters >= 0, s"k >= 1, iters >= 0: $k, $iters")
    val spark = embs.sparkSession
    import spark.implicits._

    val corpus = embs.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .persist() // read once across iters+1 passes; released before return

    // Deterministic init: first k ids in portable hash order.
    var centers: Array[Array[Double]] = corpus
      .orderBy(Sampling.hashKey("vec_id"), col("vec_id"))
      .limit(k)
      .select($"v").as[Seq[Float]]
      .collect()
      .map(Similarity.unit)

    def assign(cs: Array[Array[Double]]): DataFrame = {
      val bc = spark.sparkContext.broadcast(cs)
      val nearest = udf { (v: Seq[Float]) =>
        val cs = bc.value
        var best = 0
        var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < cs.length) {
          val center = cs(c)
          var dot = 0.0; var nv = 0.0
          val n = math.min(center.length, v.length)
          var i = 0
          while (i < n) { dot += center(i) * v(i); nv += v(i).toDouble * v(i); i += 1 }
          val s = if (nv == 0) 0.0 else dot / math.sqrt(nv) // centers are unit
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        best
      }
      corpus.withColumn("cluster", nearest($"v"))
    }

    var it = 0
    while (it < iters) {
      val assigned = assign(centers)
      // Per-dimension means via posexplode — one shuffle keyed by
      // (cluster, dim), partial aggregation on the map side. Summed in
      // FIXED-POINT (per-element scale to 2^24 then a long sum): like
      // the previous decimal(30,12) sums, integer addition is exact and
      // associative, so the mean is independent of partitioning and
      // shuffle-combine order (double sums are not, and a low-bit
      // difference can flip a near-tied assignment, breaking the
      // determinism contract) — but long aggregation stays in codegen
      // while precision-30 decimal falls back to BigDecimal, which
      // dominated the iteration cost. The 2^-24 per-element rounding is
      // itself deterministic; headroom: |x| <= ~1 scaled by 2^24 over
      // ~2^39 elements per (cluster, dim) before overflow.
      val Scale = (1L << 24).toDouble
      // Headroom guard rides the same shuffle (no extra action):
      // |sum| <= max|x| * Scale * count per (cluster, dim); anything
      // past 2^62 risks silent long wraparound, so fail loudly — the
      // documented |x| <~ 1 input bound stops being a comment and
      // becomes a runtime contract.
      val rows = assigned
        .select($"cluster", posexplode($"v").as(Seq("dim", "x")))
        .groupBy($"cluster", $"dim")
        .agg(
          (sum(($"x" * Scale).cast("long")).cast("double") /
            (count(lit(1)).cast("double") * Scale)).as("m"),
          (max(abs($"x")) * Scale * count(lit(1)).cast("double")).as("hr"))
        .groupBy($"cluster")
        .agg(sort_array(collect_list(struct($"dim", $"m"))).as("dm"),
          max($"hr").as("hr"))
        .select($"cluster", $"dm.m".as("center"), $"hr")
        .as[(Int, Seq[Double], Double)]
        .collect()
      val worst = rows.iterator.map(_._3).maxOption.getOrElse(0.0)
      if (worst >= math.pow(2.0, 62))
        throw new IllegalStateException(
          f"kmeans fixed-point accumulator headroom exceeded ($worst%.3g >= 2^62): " +
            "embedding magnitudes or per-cluster element counts are outside the " +
            "|x| <~ 1, n <~ 2^38 design envelope — normalize inputs or raise k")
      val means = rows.iterator.map { case (c, m, _) => c -> m }.toMap
      centers = centers.zipWithIndex.map { case (old, c) =>
        means.get(c).map(m => Similarity.unit(m.map(_.toFloat))).getOrElse(old)
      }
      it += 1
    }
    val result = assign(centers).select($"vec_id", $"cluster")
    // Safe to release: everything downstream is deterministic, so a
    // post-eviction recompute reproduces identical assignments.
    corpus.unpersist(blocking = false)
    (result, centers)
  }

  /** IVF top-k: assign the corpus to k-means cells once, then each
    * query probes only its `nProbe` nearest cells — the classic coarse
    * quantizer. Candidate work is O(Q * nProbe * cellSize) instead of
    * O(Q * N); recall comes from probing multiple cells. Output:
    * (query_id, neighbor_id, rank, score), self-matches excluded.
    */
  def ivfTopK(
      embs: DataFrame,
      queries: DataFrame,
      k: Int,
      nClusters: Int = 0,
      nProbe: Int = 4,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nTotal: Long = 0L): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._

    // nClusters <= 0 = auto: ~sqrt(N) cells (the standard IVF balance —
    // cell count == expected cell size), floored at 16. A static
    // default would leave cells with N/16 vectors at corpus scale,
    // making every probe a near-full scan. Callers that already know
    // the corpus size pass `nTotal` and skip the count() action.
    val kCells =
      if (nClusters > 0) nClusters
      else {
        val n = if (nTotal > 0L) nTotal else embs.count()
        math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong).min(1 << 20).toInt
      }
    val (assigned, centers) = kmeans(embs, kCells, iters, idCol, vecCol)
    val corpus = embs
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nv"))
      .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")

    // Each query probes its nProbe nearest cells (centers are tiny —
    // pre-converted to float ONCE, not per row inside the UDF).
    val bc = spark.sparkContext.broadcast(centers.map(_.map(_.toFloat)))
    val probes = udf { (v: Seq[Float]) =>
      bc.value.indices
        .map(c => (c, Similarity.cosine(bc.value(c), v)))
        .sortBy { case (c, s) => (-s, c) }
        .take(nProbe)
        .map(_._1)
    }
    val q = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .withColumn("cluster", explode(probes(col("qv"))))

    // Score is rounded BEFORE ranking (ties at 4 decimals break by id),
    // exactly as the original window re-rank did; the bounded-heap
    // reduction only changes the shuffle size, not the rows.
    val cands = q.join(corpus, "cluster")
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("score", round(Similarity.cosineCol(spark, $"qv", $"nv"), 4))
      .select($"query_id", $"neighbor_id", $"score")
    Similarity.rankTopK(cands, k)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"), $"score")
  }
}
