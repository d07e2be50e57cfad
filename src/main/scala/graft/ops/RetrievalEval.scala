package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — the evaluation half of the retrieval
  * tier ([[Bm25]], [[Bm25Index]], [[AnnIndex]], [[Bm25.rrf]] produce
  * rankings; this scores them against a relevance set). The standard
  * trec_eval trio per query: recall@k, reciprocal rank (MRR's per-query
  * term), and binary-gain nDCG@k.
  *
  * Engine-portable fixed-point discipline (the [[Bm25]] pattern): the
  * one libm factor — the 1/log2(rank+1) position discount — is snapped
  * to integer micro-points PER POSITION (`floor(1e6/log2(r+1) + 0.5)`,
  * stable across engines for any realistic k because the true values
  * sit far from the rounding boundary), DCG and ideal DCG are integer
  * sums of those, and the emitted ratios are single exact-IEEE
  * divisions of small integers rounded at 6 places — so a DuckDB
  * replay hash-matches, not approximately-matches.
  *
  * Scale shape: both inputs are per-query frames (a run is Q·k rows, a
  * relevance set Q·judged rows — never corpus-sized), the hit join is
  * co-keyed on (query_id, doc_id), and everything after is one
  * query-sized aggregation. Evaluating a million-query run is one
  * shuffle of the run itself.
  */
object RetrievalEval {

  /** Integer micro-points of the rank-`r` position discount,
    * 1e6/log2(r+1) snapped once — the shared DCG kernel.
    */
  private def discMicro(rank: Column): Column =
    floor(lit(1000000.0) / log2(rank.cast("double") + lit(1.0)) + lit(0.5)).cast("long")

  /** Per-query metrics of `run` against `qrels`:
    *
    * {{{
    *   (query_id, n_rel, n_hit, recall, rr_micro,
    *    dcg_micro, idcg_micro, ndcg)
    * }}}
    *
    * `run`: (query_id, doc_id, rank) — a ranking, extra columns
    * ignored; only positions <= k are scored. `qrels`: (query_id,
    * doc_id) — the binary relevance set. Only judged queries (present
    * in `qrels`) are evaluated — trec_eval's convention; a judged query
    * the run never answers still appears, with zero hits.
    *
    *   - recall   = n_hit / n_rel, rounded at 6
    *   - rr_micro = floor(1e6 / first-relevant-rank + 0.5); 0 if none
    *   - dcg_micro / idcg_micro: binary-gain DCG@k as integer
    *     micro-points (ideal = the first min(n_rel, k) positions)
    *   - ndcg     = dcg_micro / idcg_micro, rounded at 6
    */
  def evaluate(
      run: DataFrame,
      qrels: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val r = run.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      col("rank").cast("long").as("rank"))
      .filter(col("rank") <= k)
    val rel = qrels.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"))
      .distinct()
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = r.join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_hit"),
        min(col("rank")).as("first_rank"),
        sum(discMicro(col("rank"))).as("dcg_micro"))
    // Ideal DCG: the first min(n_rel, k) positions, summed with the
    // SAME snapped per-position discount (sequence + aggregate — stays
    // in codegen, n_rel-bounded work per query).
    val idcg = aggregate(
      sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
      lit(0L),
      (acc: Column, i: Column) => acc + discMicro(i))
    nRel.join(hits, Seq("query_id"), "left_outer")
      .select(
        col("query_id"),
        col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), 6).as("recall"),
        coalesce(
          floor(lit(1000000.0) / col("first_rank").cast("double") + lit(0.5)).cast("long"),
          lit(0L)).as("rr_micro"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        idcg.as("idcg_micro"),
        round(coalesce(col("dcg_micro"), lit(0L)).cast("double") /
          idcg.cast("double"), 6).as("ndcg"))
  }

  /** The run-level summary a dashboard wants: judged-query count and
    * the means of recall@k, MRR and nDCG@k (exact-IEEE mean of the
    * per-query values, rounded at 6).
    */
  def summarize(run: DataFrame, qrels: DataFrame, k: Int): DataFrame =
    evaluate(run, qrels, k).agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("recall")), 6).as("mean_recall"),
      round(avg(col("rr_micro").cast("double") / lit(1000000.0)), 6).as("mrr"),
      round(avg(col("ndcg")), 6).as("mean_ndcg"))

  /** Per-query GRADED metrics — real qrels carry judgment LEVELS
    * (trec-style 0..3), not booleans. Gain = the grade itself, in the
    * same micro-point discipline as [[evaluate]], plus average
    * precision (MAP's per-query term, binary over grade > 0):
    *
    * {{{
    *   (query_id, n_rel, n_hit, recall, rr_micro,
    *    dcg_micro, idcg_micro, ndcg, ap_sum_micro, ap)
    * }}}
    *
    * `qrels`: (query_id, doc_id, `gradeCol`) — integer grades; grade 0
    * rows are judged-NON-relevant (trec convention) and contribute to
    * nothing; duplicate (query, doc) judgments collapse to the MAX
    * grade (deterministic). With every grade 1 this equals [[evaluate]]
    * plus the two AP columns (asserted in the spec).
    *
    *   - dcg_micro  = sum over hits of grade * discMicro(rank) —
    *     integer products of integer micro-points, orderless sum
    *   - idcg_micro = grades sorted (grade desc, doc_id asc), first
    *     min(n_rel, k) positions through the same kernel
    *   - ap_sum_micro = sum over hits of floor(1e6 * cumHits/rank + 0.5)
    *     (each precision-at-hit one exact IEEE division, snapped); ap =
    *     round(ap_sum_micro / 1e6 / n_rel, 6)
    *
    * Scale shape: identical to [[evaluate]] — run-sized join, two
    * windows over per-query frames bounded by k and the judged count
    * (never corpus-sized), one query-sized aggregation.
    */
  def evaluateGraded(
      run: DataFrame,
      qrels: DataFrame,
      k: Int,
      gradeCol: String = "grade"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val r = run.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      col("rank").cast("long").as("rank"))
      .filter(col("rank") <= k)
    val rel = qrels.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      col(gradeCol).cast("long").as("grade"))
      .filter(col("grade") > 0)
      .groupBy("query_id", "doc_id").agg(max(col("grade")).as("grade"))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    // cum = hits-so-far at each hit's rank (row_number over rank order
    // — every row IS a hit), so precision@that-rank = cum / rank.
    val wCum = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val hits = r.join(rel, Seq("query_id", "doc_id"))
      .withColumn("cum", row_number().over(wCum).cast("long"))
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_hit"),
        min(col("rank")).as("first_rank"),
        sum(col("grade") * discMicro(col("rank"))).as("dcg_micro"),
        sum(floor(lit(1000000.0) * col("cum").cast("double") / col("rank").cast("double") +
          lit(0.5)).cast("long")).as("ap_sum_micro"))
    // Ideal DCG: the judged grades themselves, best-first (grade desc,
    // doc_id asc for determinism), first min(n_rel, k) positions.
    val wIdeal = Window.partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col("doc_id"))
    val idcg = rel
      .withColumn("pos", row_number().over(wIdeal).cast("long"))
      .filter(col("pos") <= k)
      .groupBy("query_id")
      .agg(sum(col("grade") * discMicro(col("pos"))).as("idcg_micro"))
    nRel.join(hits, Seq("query_id"), "left_outer")
      .join(idcg, Seq("query_id"))
      .select(
        col("query_id"),
        col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), 6).as("recall"),
        coalesce(
          floor(lit(1000000.0) / col("first_rank").cast("double") + lit(0.5)).cast("long"),
          lit(0L)).as("rr_micro"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        col("idcg_micro"),
        round(coalesce(col("dcg_micro"), lit(0L)).cast("double") /
          col("idcg_micro").cast("double"), 6).as("ndcg"),
        coalesce(col("ap_sum_micro"), lit(0L)).as("ap_sum_micro"),
        round(coalesce(col("ap_sum_micro"), lit(0L)).cast("double") / lit(1000000.0) /
          col("n_rel").cast("double"), 6).as("ap"))
  }

  /** [[summarize]] for graded qrels, with MAP: the means of recall@k,
    * MRR, graded nDCG@k and AP over the judged queries.
    */
  def summarizeGraded(
      run: DataFrame, qrels: DataFrame, k: Int, gradeCol: String = "grade"): DataFrame =
    evaluateGraded(run, qrels, k, gradeCol).agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("recall")), 6).as("mean_recall"),
      round(avg(col("rr_micro").cast("double") / lit(1000000.0)), 6).as("mrr"),
      round(avg(col("ndcg")), 6).as("mean_ndcg"),
      round(avg(col("ap")), 6).as("map"))

  /** Recall@k of a persisted [[AnnIndex]] as a function of probe depth
    * — the tuning table a serving deployment reads before picking
    * `nProbe` (each +1 probe buys recall and costs a cell scan;
    * at nProbe = cell count the answer is exact by construction, so
    * the curve's last row is the sanity anchor):
    *
    * {{{
    *   (n_probe, n_queries, mean_recall)   one row per requested depth
    * }}}
    *
    * Ground truth is the index's OWN full-depth answer (every cell
    * probed — exact top-k over the live corpus, including streamed
    * appends and minus tombstones), so the curve isolates the
    * IVF-approximation loss from everything else. Queries and k are
    * the deployment's real shapes; cost is `nProbes.size + 1` probe
    * rounds of the batch, driver-bounded by the depth list.
    */
  def annRecallCurve(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      queries: DataFrame,
      k: Int,
      nProbes: Seq[Int],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      pq: Boolean = false,
      refine: Int = 0): DataFrame = {
    require(nProbes.nonEmpty, "annRecallCurve needs at least one probe depth")
    val nCells = spark.read.parquet(AnnIndex.centersPath(indexDir)).count().toInt
    // Ground truth is always the EXACT full-depth raw-vector answer, so
    // the PQ curve (pq = true — requires a buildPq sidecar) measures
    // the JOINT loss of probe depth + quantization + the refine budget:
    // at nProbe = cell count with refine >= corpus the PQ path
    // re-ranks every candidate exactly and the curve closes to 1.0.
    val truth = AnnIndex.topK(spark, indexDir, queries, k, nProbe = nCells,
        idCol = idCol, vecCol = vecCol)
      .select(col("query_id"), col("neighbor_id").as("doc_id"))
      .localCheckpoint() // one ground-truth pass feeds every depth
    nProbes.distinct.sorted.map { p =>
      val probed =
        if (pq) AnnIndex.topKPq(spark, indexDir, queries, k, nProbe = p,
          refine = refine, idCol = idCol, vecCol = vecCol)
        else AnnIndex.topK(spark, indexDir, queries, k, nProbe = p,
          idCol = idCol, vecCol = vecCol)
      val run = probed
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      summarize(run, truth, k)
        .select(lit(p).cast("int").as("n_probe"), col("n_queries"), col("mean_recall"))
    }.reduce(_.unionByName(_))
  }
}
