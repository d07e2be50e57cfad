package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression and
  * asymmetric-distance (ADC) similarity search — the standard scale
  * path for billion-vector ANN (Jegou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * The vector is split into `m` contiguous subvectors; each subspace
  * gets its own `codes`-entry codebook trained by k-means, and a vector
  * is stored as `m` one-byte code indices — 64-dim float32 embeddings
  * compress 256 B -> 8 B at m=8. Queries stay uncompressed: a per-query
  * lookup table LUT[sub][code] = <q_sub, codeword> turns each corpus
  * row's score into `m` table reads and adds (ADC), so the scan never
  * touches float vectors.
  *
  * Scale shape:
  *   - training: all `m` sub-codebooks train SIMULTANEOUSLY — one
  *     corpus pass per Lloyd iteration with a groupBy((sub, code, dim))
  *     shuffle of fixed-point partial sums (the [[Clustering.kmeans]]
  *     determinism pattern), so PQ training costs the same number of
  *     shuffles as a single k-means;
  *   - encode: one map over the corpus with the (m * codes * subDim)
  *     codebooks broadcast;
  *   - search: queries broadcast as LUTs (Q * m * codes floats),
  *     per-partition bounded heaps emit O(partitions * Q * R) candidate
  *     rows — never O(N * Q) — then the exact-cosine refine re-ranks
  *     only the R survivors per query.
  *
  * Determinism by construction (same init-by-portable-hash-order + fixed
  * iteration count as [[Clustering.kmeans]]): identical codebooks, codes
  * and rankings on every run and partitioning, which is what makes the
  * recall contract (`q_pq_recall`) a hard oracle instead of a flaky one.
  *
  * The reference engine has no similarity search (SURVEY §2.3 "absent");
  * this is part of the LLM-pipeline layer built per the round brief.
  */
object ProductQuantization {

  /** Codebooks as [sub][code][dim]: `codebooks(s)(c)` is the codeword
    * for code `c` of subspace `s`, in the subspace's own coordinates.
    */
  type Codebooks = Array[Array[Array[Double]]]

  private[graft] def subSlice(v: Array[Double], m: Int, sub: Int): Array[Double] = {
    // Subspace s owns dims [s*ceil(d/m), min((s+1)*ceil(d/m), d)) — the
    // LAST subspace may be short when m does not divide d.
    val w = (v.length + m - 1) / m
    val lo = sub * w
    val hi = math.min(lo + w, v.length)
    if (lo >= hi) Array.emptyDoubleArray else java.util.Arrays.copyOfRange(v, lo, hi)
  }

  private def nearestCode(cb: Array[Array[Double]], sv: Array[Double]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cb.length) {
      val w = cb(c)
      var d = 0.0
      val n = math.min(w.length, sv.length)
      var i = 0
      while (i < n) { val t = w(i) - sv(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train `m` sub-codebooks of `codes` entries each over the
    * UNIT-NORMALIZED corpus (PQ of normalized vectors makes the ADC
    * inner product approximate cosine). One corpus pass per iteration;
    * deterministic (hash-order init, fixed rounds, fixed-point sums).
    */
  def trainCodebooks(
      embs: DataFrame,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Codebooks = {
    require(m >= 1 && codes >= 1 && codes <= 256 && iters >= 0,
      s"m >= 1, 1 <= codes <= 256, iters >= 0: $m, $codes, $iters")
    val spark = embs.sparkSession
    import spark.implicits._

    // (vec_id, sub, sv): every subvector of every (normalized) vector —
    // all m subspaces ride the same frame, so each Lloyd iteration is
    // ONE corpus pass regardless of m.
    val subUdf = udf { (v: Seq[Float]) =>
      val u = Similarity.unit(v)
      (0 until m).map(s => subSlice(u, m, s))
    }
    val subs = embs
      .select(col(idCol).cast("long").as("vec_id"), posexplode(subUdf(col(vecCol))).as(Seq("sub", "sv")))
      .persist()

    // Deterministic init: the subvectors of the first `codes` ids in
    // portable hash order seed every subspace's codebook (standard
    // sample-init; the ids are a reproducible pseudo-random draw).
    var books: Codebooks = {
      val seed = subs
        .orderBy(Sampling.hashKey("vec_id"), $"vec_id", $"sub")
        .filter($"sub" >= 0) // no-op; keeps the sort stable pre-limit
        .limit(codes * m)
        .select($"sub", $"vec_id", $"sv")
        .as[(Int, Long, Seq[Double])]
        .collect()
      val bySub = seed.groupBy(_._1)
      Array.tabulate(m) { s =>
        val rows = bySub.getOrElse(s, Array.empty).sortBy(_._2).map(_._3.toArray)
        // Short corpora (< codes vectors) repeat the last seed — those
        // duplicate codewords simply never win an assignment tie.
        Array.tabulate(codes)(c => if (rows.isEmpty) Array.emptyDoubleArray else rows(math.min(c, rows.length - 1)))
      }
    }

    val Scale = (1L << 24).toDouble
    val subDim = books.iterator.flatMap(_.iterator.map(_.length)).maxOption.getOrElse(0)
    var it = 0
    while (it < iters) {
      // Native codegen'd subcode assignment (see [[graft.functions
      // .NearestSubCode]]) — the N*m-row pass of every iteration, same
      // nearest-code result bit for bit as the UDF it replaced.
      val assignCol = graft.functions.ColumnBridge.toColumn(
        graft.functions.NearestSubCode(
          graft.functions.ColumnBridge.toExpression($"sub"),
          graft.functions.ColumnBridge.toExpression($"sv"),
          graft.functions.RefTable.auto(subs.sparkSession, books,
            graft.functions.RefTable.bytes3(books, 8))))
      // Per-(sub, code) fixed-point means through the shared
      // [[Clustering.centroidRows]] accumulator (key = sub * codes +
      // code): the old shape posexploded every subvector to N*m*subDim
      // (sub, code, dim, x) rows and paid TWO hash-aggregate exchanges
      // per Lloyd round; the array accumulator does one array-add per
      // subvector row and one job (zero exchanges under the
      // driver-combine guard). Sums, counts, per-dim max|x| and the
      // division below are the same exact integer/IEEE ops in the same
      // order, so the codebooks are bit-identical.
      val rows = Clustering.centroidRows(
        subs.withColumn("code", assignCol)
          .select(($"sub" * lit(codes) + $"code").as("sc"), $"sv")
          .as[(Int, Seq[Double])],
        Clustering.CentroidAggD, (m * codes).toLong, subDim.toLong)
      val worst = rows.iterator.map { case (_, acc) =>
        var hr = 0.0
        var d = 0
        while (d < acc.maxAbs.length) {
          val bnd = acc.maxAbs(d) * Scale * acc.counts(d).toDouble
          if (bnd > hr) hr = bnd
          d += 1
        }
        hr
      }.maxOption.getOrElse(0.0)
      if (worst >= math.pow(2.0, 62))
        throw new IllegalStateException(
          f"PQ fixed-point accumulator headroom exceeded ($worst%.3g >= 2^62): " +
            "inputs are outside the unit-normalized design envelope")
      val next = books.map(_.clone())
      rows.foreach { case (sc, acc) =>
        val mean = Array.tabulate(acc.sums.length) { i =>
          if (acc.counts(i) == 0L) 0.0
          else acc.sums(i).toDouble / (acc.counts(i).toDouble * Scale)
        }
        next(sc / codes)(sc % codes) = mean
      }
      books = next // codes with no members keep their previous codeword
      it += 1
    }
    subs.unpersist(blocking = false)
    books
  }

  /** (vec_id, pq_codes array<int>): each vector's `m` nearest-codeword
    * indices — the compressed representation (one byte each at
    * codes <= 256; kept as int for SQL friendliness).
    */
  def encode(
      embs: DataFrame,
      books: Codebooks,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Native codegen'd kernel (see [[graft.functions.PqEncode]]): same
    // codes bit for bit as the original UDF, minus the per-row boxed
    // conversion + normalized copy — this is the corpus-sized pass.
    embs.select(col(idCol).cast("long").as("vec_id"),
      graft.functions.ColumnBridge.toColumn(graft.functions.PqEncode(
        graft.functions.ColumnBridge.toExpression(col(vecCol)),
        graft.functions.RefTable.auto(embs.sparkSession, books,
          graft.functions.RefTable.bytes3(books, 8)))).as("pq_codes"))
  }

  /** Mean squared reconstruction error of the codebooks over the corpus
    * — the training-quality scalar (decreases with codes/m; the spec
    * pins it against the trivial 1-code baseline).
    */
  def reconstructionError(
      embs: DataFrame,
      books: Codebooks,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Double = {
    val spark = embs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(books)
    val m = books.length
    val err = udf { (v: Seq[Float]) =>
      val u = Similarity.unit(v)
      var e = 0.0
      var s = 0
      while (s < m) {
        val sv = subSlice(u, m, s)
        val w = bc.value(s)(nearestCode(bc.value(s), sv))
        val n = math.min(w.length, sv.length)
        var i = 0
        while (i < n) { val t = w(i) - sv(i); e += t * t; i += 1 }
        s += 1
      }
      e
    }
    embs.select(avg(err(col(vecCol)))).as[Double].head()
  }

  /** IVF-PQ top-k: the coarse quantizer ([[Clustering.kmeans]] cells)
    * restricts the scan to each query's `nProbe` nearest cells, and the
    * restricted candidates are scored by PQ-ADC table adds, then
    * exact-cosine refined — candidate work is
    * O(Q * nProbe * cellSize * m) table lookups against a corpus stored
    * as m bytes/vector: the canonical billion-vector ANN shape.
    *
    * This variant encodes RAW vectors (not per-cell residuals), so one
    * LUT per query serves every probed cell; residual encoding would
    * sharpen quantization at the cost of a per-(query, cell) LUT —
    * the exact-refine step already recovers the ranking precision.
    *
    * Shape: (cluster, query_id) probe pairs join the encoded corpus on
    * its cluster key — one shuffle — then a broadcast LUT map scores
    * rows and [[Similarity.rankTopK]] bounds the survivors.
    */
  def ivfPqTopK(
      embs: DataFrame,
      queries: DataFrame,
      k: Int,
      nClusters: Int = 0,
      nProbe: Int = 8,
      m: Int = 16,
      codes: Int = 32,
      iters: Int = 5,
      refine: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nTotal: Long = 0L): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val r = if (refine > 0) refine else 4 * k

    val kCells =
      if (nClusters > 0) nClusters
      else {
        val n = if (nTotal > 0L) nTotal else embs.count()
        math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong).min(1 << 20).toInt
      }
    val (assigned, centers) = Clustering.kmeans(embs, kCells, iters, idCol, vecCol)
    val books = trainCodebooks(embs, m, codes, iters, idCol, vecCol)
    val encoded = encode(embs, books, idCol, vecCol)
      .join(assigned.withColumnRenamed("vec_id", "vec_id"), "vec_id")

    // Per-query LUT ([[graft.functions.PqLut]]) and probe list
    // ([[graft.functions.TopCentroids]]) as executor-side projections
    // over the query frame — the query batch never funnels through the
    // driver; only the trained centers/codebooks (k * dim and
    // m * codes * subDim constants) ship to executors.
    val fCenters = centers.map(_.map(_.toFloat))
    // null query embeddings raise instead of silently dropping at the
    // probe explode (same contract as AnnIndex.topKPq)
    val qvChecked = when(col(vecCol).isNull,
      raise_error(concat(lit("ivfPqTopK: null query embedding for id "),
        col(idCol).cast("string")))).otherwise(col(vecCol))
    val q = queries
      .select(col(idCol).cast("long").as("query_id"), qvChecked.as("qv"))
      .withColumn("lut", graft.functions.ColumnBridge.toColumn(graft.functions.PqLut(
        graft.functions.ColumnBridge.toExpression($"qv"),
        graft.functions.RefTable.auto(spark, books,
          graft.functions.RefTable.bytes3(books, 8)))))
      .withColumn("cluster", explode(graft.functions.ColumnBridge.toColumn(
        graft.functions.TopCentroids(
          graft.functions.ColumnBridge.toExpression($"qv"),
          graft.functions.RefTable.auto(spark, fCenters,
            graft.functions.RefTable.bytes2(fCenters, 4)), nProbe))))
      .drop("qv")
      .localCheckpoint() // probe+LUT once: feeds the size guard AND the join

    // Native codegen'd ADC kernel (see [[graft.functions.AdcScore]]):
    // the Q * nProbe * cellSize inner scan stays in whole-stage
    // codegen — two array reads + an add per subspace. Queries are the
    // small side by contract (same as Similarity.topK), but the
    // exploded frame carries an m * codes float LUT per row, so the
    // broadcast hint is GUARDED like [[graft.ops.AnnIndex.topKPq]]'s:
    // past ~64 MiB estimated, fall back to a shuffle join on cluster.
    val probeRows = q.count()
    val probeBytes = probeRows * (4L * m * codes + 64L)
    val qSide =
      if (probeBytes <= Similarity.BroadcastGuardBytes) broadcast(q) else q
    val cands = qSide.join(encoded, "cluster")
      .filter($"query_id" =!= $"vec_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        graft.functions.ColumnBridge.toColumn(graft.functions.AdcScore(
          graft.functions.ColumnBridge.toExpression($"lut"),
          graft.functions.ColumnBridge.toExpression($"pq_codes"), codes)).as("score"))
    val survivors = Similarity.rankTopK(cands, r).select($"query_id", $"neighbor_id")

    // Refine broadcast guarded like the probe side's (probeRows
    // over-counts Q by up to nProbe — conservative: shuffle early,
    // never broadcast big). dim = the codebooks' summed sub-dims.
    val dim = books.map(_.head.length).sum
    val qVecs = Similarity.guardedVecBroadcast(
      queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv")),
      probeRows, dim)
    val nVecs = embs.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nv"))
    val exact = survivors
      .join(qVecs, "query_id")
      .join(nVecs, "neighbor_id")
      .withColumn("score", Similarity.cosineCol(spark, $"qv", $"nv"))
    Similarity.rankTopK(exact.select($"query_id", $"neighbor_id", $"score"), k)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
        round($"score", 4).as("score"))
  }

  /** PQ-ADC top-k with exact refine: score every encoded corpus row by
    * LUT adds (per-partition bounded heaps keep the best `refine`
    * candidates per query), then re-rank ONLY those candidates with
    * exact cosine. Output (query_id, neighbor_id, rank, score) — the
    * [[Similarity.topK]] shape; score is the EXACT cosine (rounded 4dp),
    * so every emitted row is verifiable against the raw vectors, and
    * recall is the only approximation.
    */
  def pqTopK(
      embs: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      refine: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val r = if (refine > 0) refine else 4 * k

    val books = trainCodebooks(embs, m, codes, iters, idCol, vecCol)
    val encoded = encode(embs, books, idCol, vecCol)

    // Query LUTs: LUT[sub][code] = <q_sub, codeword>. ADC score of a row
    // = sum over subs of LUT[sub][row.code(sub)] ~= <q, reconstruct(row)>
    // ~= cosine for unit inputs. The LUT build is the executor-side
    // [[graft.functions.PqLut]] projection — nothing about the query
    // batch funnels through the driver (the ivfPqTopK/topKPq shape);
    // null embeddings raise instead of dropping silently.
    val qvChecked = when(col(vecCol).isNull,
      raise_error(concat(lit("pqTopK: null query embedding for id "),
        col(idCol).cast("string")))).otherwise(col(vecCol))
    val q = queries
      .select(col(idCol).cast("long").as("query_id"), qvChecked.as("qv"))
      .withColumn("lut", graft.functions.ColumnBridge.toColumn(graft.functions.PqLut(
        graft.functions.ColumnBridge.toExpression($"qv"),
        graft.functions.RefTable.auto(spark, books,
          graft.functions.RefTable.bytes3(books, 8)))))
      .drop("qv")
      .localCheckpoint() // LUTs once: feeds the size guard AND the join
    // Full-scan ADC — no coarse quantizer, so every (row, query) pair
    // is scored; that N * Q work is this operator's CONTRACT (use
    // ivfPqTopK to restrict the scan). The fan-out is a broadcast HASH
    // join on a constant key rather than a crossJoin: identical rows,
    // but the hash join stays inside whole-stage codegen (a
    // BroadcastNestedLoopJoin is not codegen'd — measured ~1.5x slower
    // here) and the plan-audit's all-pairs guard stays strict for
    // every query whose cartesian would be an ACCIDENT. Past the
    // 64 MiB broadcast guard the deliberate cartesian is explicit.
    val probeRows = q.count()
    val probeBytes = probeRows * (4L * m * codes + 64L)
    // The constant key must be NON-FOLDABLE (pmod of a column, not a
    // literal) or Catalyst folds the equi-condition away and falls
    // back to the nested-loop join this shape exists to avoid.
    val allPairs =
      if (probeBytes <= Similarity.BroadcastGuardBytes)
        encoded.withColumn("__all", pmod($"vec_id", lit(1L)))
          .join(broadcast(q.withColumn("__all", pmod($"query_id", lit(1L)))), "__all")
          .drop("__all")
      else encoded.crossJoin(q)
    val adcCands = allPairs
      .filter($"query_id" =!= $"vec_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        graft.functions.ColumnBridge.toColumn(graft.functions.AdcScore(
          graft.functions.ColumnBridge.toExpression($"lut"),
          graft.functions.ColumnBridge.toExpression($"pq_codes"), codes)).as("score"))

    // Refine: exact cosine on the R survivors per query only. rankTopK's
    // per-partition bounded heaps prune the N * Q candidate stream to
    // O(partitions * Q * R) rows before its one shuffle.
    val survivors = Similarity.rankTopK(adcCands, r)
      .select($"query_id", $"neighbor_id")
    // Refine broadcast under the same guard (probeRows here IS Q —
    // pqTopK's probe frame is not exploded).
    val qVecs = Similarity.guardedVecBroadcast(
      queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv")),
      probeRows, books.map(_.head.length).sum)
    val nVecs = embs.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nv"))
    val exact = survivors
      .join(qVecs, "query_id")
      .join(nVecs, "neighbor_id")
      .withColumn("score", Similarity.cosineCol(spark, $"qv", $"nv"))
    Similarity.rankTopK(exact.select($"query_id", $"neighbor_id", $"score"), k)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
        round($"score", 4).as("score"))
  }
}
