package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate (query, neighbor, score) triple emitted by the per-partition
  * bounded heaps in [[Similarity.topK]]. Top-level and public so the
  * Dataset encoder's generated code can construct it (Janino cannot
  * instantiate a private nested case class — Spark would silently fall
  * back to interpreted evaluation).
  */
case class Cand(queryId: Long, vecId: Long, score: Double)

/** One ranked integer-scored result row from [[Similarity.sumRankTopKMicro]]
  * (top-level for the same Janino-constructibility reason as [[Cand]]).
  */
case class RankedSum(query_id: Long, doc_id: Long, rank: Long, score_micro: Long)

/** One ranked fusion row from [[Similarity.sumRankTopKFusion]]. */
case class RankedFusion(
    query_id: Long, doc_id: Long, rank: Long, n_lists: Long, rrf_micro: Long)

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[topK]]: exact brute-force cosine top-k. The query set is
  *     broadcast (queries are the small side by construction); each
  *     partition keeps a bounded per-query heap and emits only k
  *     candidates per (query, partition), so the shuffle is
  *     O(partitions * Q * k) — NOT O(N * Q). The final reduction is a
  *     window over that small candidate set. Scales to arbitrary N with
  *     fixed memory.
  *   - [[annTopK]]: LSH-bucketed (random hyperplane signatures, L
  *     tables). Candidates come from bucket joins only; exact re-rank
  *     on the candidate set. The scale path when Q is also large.
  */
object Similarity {

  import org.apache.spark.sql.{Column, SparkSession}

  /** Codegen'd cosine column (native Catalyst expression — no per-row
    * boxing, stays inside WholeStageCodegen). Registration is shared
    * with the SQL surface in [[graft.functions.GraftFunctions]].
    */
  def cosineCol(spark: SparkSession, a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.registerNativeCosine(spark)
    call_function("graft_cosine_native", a, b)
  }

  /** L2-normalize to unit length (double precision). */
  def unit(v: Seq[Float]): Array[Double] = {
    val d = v.toArray.map(_.toDouble)
    val n = math.sqrt(d.map(x => x * x).sum)
    if (n == 0) d else d.map(_ / n)
  }

  /** Ragged inputs truncate to the common prefix, and norms are taken
    * over that prefix — bit-for-bit the same semantics as the native
    * CosineSimilarity expression; never throws.
    */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // NOTE: must stay top-level-visible (not private-nested): the Dataset
  // encoder's generated code instantiates it, and Janino can't reach a
  // private nested class — a fallback there drops the whole candidate
  // aggregation out of codegen.

  /** Exact cosine top-k of each query vector against the corpus
    * (self-matches excluded). Output:
    * (query_id, neighbor_id, rank, score) with rank 1..k by
    * (score desc, neighbor_id asc).
    */
  def topK(
      embs: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._

    val q: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), unit(r.getSeq[Float](1))))
    val bq = spark.sparkContext.broadcast(q)

    val candidates = embs
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val qs = bq.value
        // per-query bounded min-heaps of (score, vecId)
        val heaps = Array.fill(qs.length)(
          collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2))))
        it.foreach { case (vid, vec) =>
          val u = unit(vec)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv) = qs(qi)
            if (qid != vid) {
              var s = 0.0
              var i = 0
              val n = math.min(u.length, qv.length) // ragged inputs: common prefix, like cosine()
              while (i < n) { s += u(i) * qv(i); i += 1 }
              val h = heaps(qi)
              if (h.size < k) h.enqueue((s, vid))
              else if (s > h.head._1 || (s == h.head._1 && vid < h.head._2)) {
                h.dequeue(); h.enqueue((s, vid))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (s, vid) => Cand(bq.value(qi)._1, vid, s) }
        }
      }

    val w = Window.partitionBy($"queryId").orderBy($"score".desc, $"vecId")
    candidates.toDF()
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select(
        $"queryId".as("query_id"),
        $"vecId".as("neighbor_id"),
        $"rank",
        round($"score", 4).as("score"))
  }

  /** Final top-k reduction with bounded memory, shared by the ANN and
    * IVF paths: per-partition, per-query bounded min-heaps prune the
    * candidate set to O(partitions * Q * k) rows BEFORE the shuffle,
    * then a window over that small set assigns global ranks. A bare
    * window re-rank would shuffle and sort every candidate row instead.
    * Ties break by (score desc, neighbor_id asc) in both stages, so the
    * result is identical to ranking the full candidate set. Input
    * columns: (query_id, neighbor_id, score); score is ranked as given
    * (callers decide whether rounding happens before or after ranking).
    */
  private[graft] def rankTopK(cands: DataFrame, k: Int): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val pruned = cands
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("score").cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = collection.mutable.HashMap
          .empty[Long, collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (q, nid, s) =>
          val h = heaps.getOrElseUpdate(q,
            collection.mutable.PriorityQueue.empty[(Double, Long)](
              Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2))))
          if (h.size < k) h.enqueue((s, nid))
          else if (s > h.head._1 || (s == h.head._1 && nid < h.head._2)) {
            h.dequeue(); h.enqueue((s, nid))
          }
        }
        heaps.iterator.flatMap { case (q, h) =>
          h.iterator.map { case (s, nid) => Cand(q, nid, s) }
        }
      }
    val w = Window.partitionBy($"queryId").orderBy($"score".desc, $"vecId")
    pruned.toDF()
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"queryId".as("query_id"), $"vecId".as("neighbor_id"), $"rank", $"score")
  }

  /** Streaming exact-sum + bounded top-k over one query's doc-ascending
    * contribution stream: finish each doc's LONG sums (exact,
    * order-free), offer the finished doc to a k-bounded heap ordered by
    * (sumA desc, doc asc) — the [[rankTopK]] tie contract — and emit
    * the kept docs as (doc, sumA, sumB, rank 1..m). Memory is O(k) per
    * query regardless of how many docs the query matches.
    */
  private def sumTopKSorted(
      it: Iterator[(Long, Long, Long)], k: Int): Array[(Long, Long, Long, Long)] = {
    val heap = collection.mutable.PriorityQueue.empty[(Long, Long, Long)](
      Ordering.by[(Long, Long, Long), (Long, Long)](x => (-x._1, x._2)))
    var curDoc = 0L
    var sumA = 0L
    var sumB = 0L
    var open = false
    def close(): Unit = if (open) {
      if (heap.size < k) heap.enqueue((sumA, curDoc, sumB))
      else if (sumA > heap.head._1 ||
        (sumA == heap.head._1 && curDoc < heap.head._2)) {
        heap.dequeue(); heap.enqueue((sumA, curDoc, sumB))
      }
    }
    it.foreach { case (d, a, b) =>
      if (open && d == curDoc) { sumA += a; sumB += b }
      else { close(); curDoc = d; sumA = a; sumB = b; open = true }
    }
    close()
    heap.toArray.sortBy(x => (-x._1, x._2)).zipWithIndex
      .map { case ((s, d, b), i) => (d, s, b, (i + 1).toLong) }
  }

  /** Exact per-(query, doc) integer score sum AND bounded top-k rank in
    * ONE exchange: input is the PRE-aggregation contribution stream
    * (query_id, doc_id, c_micro). The previous shape —
    * `groupBy(query_id, doc_id).agg(sum)` followed by [[rankTopK]] —
    * paid a partial+final hash aggregate over near-unique (query, doc)
    * keys (pure overhead: map-side partials almost never combine
    * anything) plus a SECOND exchange for the ranking window. Here the
    * rows shuffle once by query_id, sort by doc_id inside the
    * partition (spillable sort, no hash map of the candidate set), and
    * a streaming pass finishes each doc's exact long sum into a
    * k-bounded heap. Ties and ranks are bit-identical to the old shape:
    * long sums are order-free, and the heap replicates rankTopK's
    * (score desc, doc_id asc) contract.
    */
  private[graft] def sumRankTopKMicro(contribs: DataFrame, k: Int): DataFrame = {
    val spark = contribs.sparkSession
    import spark.implicits._
    contribs
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("c_micro").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id")) { (q: Long, it: Iterator[(Long, Long, Long)]) =>
        sumTopKSorted(it.map(r => (r._2, r._3, 0L)), k)
          .iterator.map { case (d, s, _, r) => RankedSum(q, d, r, s) }
      }
      .toDF()
  }

  /** [[sumRankTopKMicro]] for RRF fusion: the second summed column is a
    * per-row 1 (the number of fused lists the doc appeared in), emitted
    * beside the rank — replaces the old rank-then-join-back-for-n_lists
    * shape with the same one-exchange pass.
    */
  private[graft] def sumRankTopKFusion(contribs: DataFrame, k: Int): DataFrame = {
    val spark = contribs.sparkSession
    import spark.implicits._
    contribs
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("c_micro").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id")) { (q: Long, it: Iterator[(Long, Long, Long)]) =>
        sumTopKSorted(it.map(r => (r._2, r._3, 1L)), k)
          .iterator.map { case (d, s, b, r) => RankedFusion(q, d, r, b, s) }
      }
      .toDF()
  }

  /** Broadcast-build cap shared by the ANN family's probe and refine
    * joins. A `broadcast()` hint bypasses Spark's size threshold, so
    * every hint on a query-batch frame ("small by convention") is
    * guarded against this estimate instead — past it the join planner
    * gets no hint and falls back to a shuffle join: identical rows,
    * bounded executor memory. A mutable VAR only so parity specs can
    * force the shuffle side of each guard; production never writes it.
    */
  private[graft] var BroadcastGuardBytes: Long = 64L << 20

  /** `qFrame`, broadcast-hinted only when `rows` vectors of `dim`
    * floats (plus ~48 B/row of array+row overhead) fit
    * [[BroadcastGuardBytes]].
    */
  private[graft] def guardedVecBroadcast(qFrame: DataFrame, rows: Long, dim: Int): DataFrame =
    if (rows * (4L * dim + 48L) <= BroadcastGuardBytes) broadcast(qFrame) else qFrame

  /** `df` broadcast-hinted only when its rows (counted here — a
    * metadata-cheap job for the parquet-backed tombstone/ids frames
    * this guards) times `perRowBytes` fit [[BroadcastGuardBytes]].
    * Past the guard the anti/semi join gets no hint and falls back to
    * a shuffle of the already candidate-bounded stream — identical
    * rows, bounded executor memory ("takedown-sized by nature" is a
    * convention, and conventions need guards: a court-ordered
    * million-doc takedown must not OOM every probe).
    */
  private[graft] def guardedRowBroadcast(df: DataFrame, perRowBytes: Long = 56L): DataFrame = {
    // LocalRelation rows are known driver-side (the tombstone sets the
    // index probes hand in) — the guard must not pay a count job there
    val rows = df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.length.toLong
      case _ => df.count()
    }
    if (rows * perRowBytes <= BroadcastGuardBytes) broadcast(df) else df
  }

  // ------------------------------------------------------------------ ANN

  /** Defaults: 16 tables x 8 bits. `bits` trades bucket selectivity
    * against recall and should grow with log2(N) at scale; for corpora
    * whose nearest neighbors are far (cosine < 0.5, like the testdata),
    * fewer bits / more tables recovers recall.
    */
  val DefaultTables = 16
  val DefaultBits = 8

  /** Deterministic random hyperplanes: tables x bits x dim, seeded. */
  private def hyperplanes(dim: Int, tables: Int, bits: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(0x9e3779b97f4a7c15L)
    Array.fill(tables, bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of `v` under table `t`'s hyperplanes. */
  private def sig(planes: Array[Array[Array[Double]]], t: Int, v: Array[Double]): Int = {
    val bits = planes(t).length
    var s = 0
    var b = 0
    while (b < bits) {
      val p = planes(t)(b)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += p(i) * v(i); i += 1 }
      if (dot >= 0) s |= (1 << b)
      b += 1
    }
    s
  }

  /** ANN top-k: random-hyperplane LSH buckets (L tables), exact cosine
    * re-rank of intra-bucket candidates. Same output shape as [[topK]];
    * recall < 1 by design — see SimilaritySpec for the measured floor.
    */
  def annTopK(
      embs: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tables: Int = DefaultTables,
      bits: Int = DefaultBits): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._

    val first = embs.select(col(vecCol)).head(1)
    if (first.isEmpty) // empty corpus: empty result, not NoSuchElementException
      return spark.emptyDataset[(Long, Long, Int, Double)]
        .toDF("query_id", "neighbor_id", "rank", "score")
    val dim = first(0).getSeq[Float](0).length
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, tables, bits))

    val sigUdf = udf((vec: Seq[Float], t: Int) => sig(planes.value, t, unit(vec)))
    def bucketed(df: DataFrame, idName: String) = df
      .select(col(idCol).cast("long").as(idName), col(vecCol).as(s"vec_$idName"))
      .withColumn("t", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("sig", sigUdf(col(s"vec_$idName"), col("t")))

    val corpus = bucketed(embs, "neighbor_id")
    // Pinned once: the query frame feeds the sig/bucket pass, the
    // refine join AND the guard's count — without the checkpoint an
    // expensive derived `queries` lineage would evaluate three times.
    val qPinned = queries.select(col(idCol), col(vecCol)).localCheckpoint()
    val qs = bucketed(qPinned, "query_id")

    // Dedupe candidate PAIRS before touching vectors: distinct() over
    // bare ids shuffles 16 bytes/row instead of two embedded vectors.
    val candIds = qs.select($"t", $"sig", $"query_id")
      .join(corpus.select($"t", $"sig", $"neighbor_id"), Seq("t", "sig"))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id")
      .distinct()
    // Guarded like the persisted-index refine joins: queries are the
    // small side by convention, but the hint must not outlive the
    // convention — past the guard the join shuffles instead.
    val qVecs = guardedVecBroadcast(
      qPinned.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("vec_query_id")),
      qPinned.count(), dim)
    val nVecs = embs.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("vec_neighbor_id"))
    val cands = candIds
      .join(qVecs, "query_id")
      .join(nVecs, "neighbor_id")
      .withColumn("score", cosineCol(spark, $"vec_query_id", $"vec_neighbor_id"))

    // Rank on the raw score, round only for display — same contract as
    // before the bounded-heap reduction replaced the global window.
    rankTopK(cands.select($"query_id", $"neighbor_id", $"score"), k)
      .select($"query_id", $"neighbor_id", $"rank", round($"score", 4).as("score"))
  }

  /** Cross-corpus near-duplicate pairs: cosine >= threshold between a
    * row of `a` and a row of `b`, via the same LSH bucketing — the two
    * corpora are bucketed under the SAME hyperplanes and only
    * intra-bucket A x B pairs are scored (never the full cross
    * product). This is the semantic-decontamination primitive: `a` =
    * training corpus, `b` = benchmark embeddings; any training row
    * matching a benchmark row above threshold is contamination the
    * verbatim k-gram scan ([[Contamination]]) cannot see after
    * paraphrase. Output (id_a, id_b, cos).
    */
  def crossNearDuplicates(
      a: DataFrame,
      b: DataFrame,
      threshold: Double = 0.9,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tables: Int = DefaultTables,
      bits: Int = DefaultBits): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val first = a.select(col(vecCol)).head(1)
    if (first.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)].toDF("id_a", "id_b", "cos")
    val dim = first(0).getSeq[Float](0).length
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, tables, bits))
    val sigUdf = udf((vec: Seq[Float], t: Int) => sig(planes.value, t, unit(vec)))
    def bucketed(df: DataFrame, idName: String) = df
      .select(col(idCol).cast("long").as(idName), col(vecCol).as(s"vec_$idName"))
      .withColumn("t", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("sig", sigUdf(col(s"vec_$idName"), col("t")))
    val candIds = bucketed(a, "id_a").select($"t", $"sig", $"id_a")
      .join(bucketed(b, "id_b").select($"t", $"sig", $"id_b"), Seq("t", "sig"))
      .select($"id_a", $"id_b")
      .distinct() // ids only — vectors join in after dedupe
    val aVecs = a.select(col(idCol).cast("long").as("id_a"), col(vecCol).as("vec_a"))
    val bVecs = b.select(col(idCol).cast("long").as("id_b"), col(vecCol).as("vec_b"))
    candIds
      .join(aVecs, "id_a")
      .join(bVecs, "id_b")
      .withColumn("cos", cosineCol(spark, $"vec_a", $"vec_b"))
      .filter($"cos" >= threshold)
      .select($"id_a", $"id_b", round($"cos", 4).as("cos"))
  }

  /** Embedding-based near-duplicate pairs: cosine >= threshold via the
    * same LSH bucketing (corpus joined to itself bucket-wise, never
    * all-pairs).
    */
  def embeddingNearDuplicates(
      embs: DataFrame,
      threshold: Double = 0.95,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tables: Int = DefaultTables,
      bits: Int = DefaultBits): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val first = embs.select(col(vecCol)).head(1)
    if (first.isEmpty) // empty corpus: empty result, not NoSuchElementException
      return spark.emptyDataset[(Long, Long, Double)].toDF("id_a", "id_b", "cos")
    val dim = first(0).getSeq[Float](0).length
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, tables, bits))
    val sigUdf = udf((vec: Seq[Float], t: Int) => sig(planes.value, t, unit(vec)))
    val b = embs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("t", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("sig", sigUdf(col("vec"), col("t")))
    val l = b.select($"t", $"sig", $"id".as("id_a"))
    val r = b.select($"t", $"sig", $"id".as("id_b"))
    val vecs = embs.select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"))
    l.join(r, Seq("t", "sig"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct() // ids only — vectors join in after dedupe
      .join(vecs.withColumnsRenamed(Map("vid" -> "id_a", "v" -> "vec_a")), "id_a")
      .join(vecs.withColumnsRenamed(Map("vid" -> "id_b", "v" -> "vec_b")), "id_b")
      .withColumn("cos", cosineCol(spark, $"vec_a", $"vec_b"))
      .filter($"cos" >= threshold)
      .select($"id_a", $"id_b", round($"cos", 4).as("cos"))
  }
}
