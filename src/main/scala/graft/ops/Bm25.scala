package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical relevance scoring — the retrieval half a curation
  * pipeline pairs with embedding search (mining seed-relevant
  * documents, building eval sets, hybrid filtering before expensive
  * model passes). Okapi BM25 with the Lucene-style non-negative idf:
  *
  * {{{
  *   idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfpart(t,d) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  *   score(q,d)  = sum over distinct query terms of idf * tfpart
  * }}}
  *
  * Engine-portable fixed-point discipline (the
  * [[Sampling.weightedSamplePerGroup]] micro-nats pattern): the one
  * libm-dependent factor (`ln`) is snapped to integer micro-nats
  * (`floor(x*1e6 + 0.5)`) the moment it is computed, every other
  * factor is exact IEEE arithmetic on an expression tree the oracle
  * replays verbatim (k1 = 1.5 and b = 0.75 are dyadic, so the
  * constants are exact), and the per-term contributions are summed as
  * INTEGER micro-points — addition order can never move a score the
  * way a floating sum across an arbitrary shuffle ordering could.
  * Scores are therefore bit-identical across engines and layouts.
  *
  * Scale shape: tf is the one corpus-sized shuffle (map-side-combined
  * groupBy over the exploded token stream, shared with [[TfIdf]]);
  * df and dl aggregate the already-small tf table; corpus stats (N,
  * avgdl) are a 1-row broadcast; the query-term table is tiny and
  * broadcasts into tf, so candidate generation is one co-partitioned
  * pass over the docs that contain at least one query term. Ranking
  * uses the shared bounded-heap top-k ([[TopK.topKPerGroup]] shape via
  * [[Similarity.rankTopK]]) — no full window sort.
  */
object Bm25 {

  /** Integer micro-points of `x` — `floor(x*1e6 + 0.5)` as a long. */
  private[ops] def micro(x: Column): Column = floor(x * lit(1000000.0) + lit(0.5)).cast("long")

  /** The idf in micro-nats — THE shared expression tree: [[scores]] and
    * [[Bm25Index.topDocs]] must stay bit-identical, so both build their
    * idf from this one definition (`nDocs`/`df` are long columns).
    */
  private[ops] def idfMicro(nDocs: Column, df: Column): Column =
    micro(log(lit(1.0) +
      ((nDocs - df).cast("double") + lit(0.5)) / (df.cast("double") + lit(0.5))))

  /** One term's contribution to a doc's score, in integer micro-points
    * (`idfMicro` already integer micro-nats; the tf saturation is exact
    * IEEE arithmetic with dyadic default constants) — shared by the
    * one-shot and the persisted index for bit-identical scores.
    */
  private[ops] def contribMicro(
      tf: Column, dl: Column, avgdl: Column, idfMicro: Column,
      k1: Double, b: Double): Column = {
    val tfpart =
      (tf.cast("double") * lit(k1 + 1.0)) /
        (tf.cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * (dl.cast("double") / avgdl)))
    floor(idfMicro.cast("double") * tfpart + lit(0.5)).cast("long")
  }

  /** Per-(query, doc) BM25 scores in integer micro-points:
    * (query_id, doc_id, score_micro). Only pairs sharing at least one
    * term appear (a zero-overlap pair scores 0 by definition).
    *
    * `queries`: (idCol -> query_id, textCol -> query text); terms are
    * deduplicated per query (standard bag-of-distinct-terms BM25).
    */
  def scores(
      docs: DataFrame,
      queries: DataFrame,
      k1: Double = 1.5,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      queryTextCol: String = "text",
      queryIdCol: String = "query_id"): DataFrame =
    contribs(docs, queries, k1, b, textCol, idCol, queryTextCol, queryIdCol)
      .groupBy("query_id", "doc_id")
      .agg(sum("c_micro").as("score_micro"))

  /** The PRE-aggregation per-(query, doc, term) contribution stream
    * (query_id, doc_id, c_micro) — [[scores]] is its exact-long-sum
    * rollup, [[topDocs]] fuses the rollup with the top-k rank in one
    * exchange ([[Similarity.sumRankTopKMicro]]).
    */
  private[ops] def contribs(
      docs: DataFrame,
      queries: DataFrame,
      k1: Double = 1.5,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      queryTextCol: String = "text",
      queryIdCol: String = "query_id"): DataFrame = {
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params: k1=$k1, b=$b")
    // dl (doc length in tokens) is size(tokens) — computed in the SAME
    // pass that explodes them and carried through the tf groupBy as a
    // doc-functional key, so no per-doc aggregation and (crucially) no
    // corpus-sized dl join back into the candidate stream: sum(tf) per
    // doc IS the token count, value-identical by construction.
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
    // tf feeds THREE branches (stats, df, the candidate join) — pin
    // one evaluation or the corpus tokenize+shuffle replays per branch.
    val tf = toks.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // Corpus stats collect driver-side (ONE row) and inline as
    // literals: a 1-row crossJoin plans a BroadcastNestedLoopJoin —
    // the shape the plan audit bans — while the literals compute the
    // identical doubles (long sums are exact; the avgdl division is
    // the same IEEE op the in-plan Divide performed). (doc_id, dl) is
    // functionally dependent, so the distinct is exact per-doc rows.
    val statsRow = {
      val spark = docs.sparkSession
      import spark.implicits._
      tf.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).as[(Long, Long)].head()
    }
    val nDocs = statsRow._1
    val avgdl = if (nDocs == 0) 1.0 else statsRow._2.toDouble / nDocs.toDouble
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries.select(
      col(queryIdCol).cast("long").as("query_id"),
      explode(TextAnalysis.tokens(col(queryTextCol))).as("term"))
      .distinct()
      .localCheckpoint() // feeds the guard's count AND two joins
    // idf snapped to micro-nats at the term level: the ln is the ONLY
    // factor two engines' libms could disagree on, so it is rounded
    // before anything multiplies it. df and n_docs are longs; the
    // ratio's expression tree below is replayed verbatim by the oracle.
    val idf = df
      .select(col("term"), col("df"),
        idfMicro(lit(nDocs), col("df")).as("idf_micro"))
    // Candidates: docs sharing a term with the query. The query-term
    // table is tiny (queries x terms) by CONVENTION, and conventions
    // get guards: both hints ride the counted qterms estimate, falling
    // back past it to shuffles of the candidate stream. idf as built
    // is CORPUS-VOCABULARY-sized — it is semi-joined down to the query
    // terms first (identical inner-join result: non-query terms never
    // matched anything after the qterms join), so the hint never ships
    // a 100-TB corpus's vocabulary to every executor.
    val qtRows = qterms.count()
    val hintable = qtRows * 96L <= Similarity.BroadcastGuardBytes
    val qtSide = if (hintable) broadcast(qterms) else qterms
    val qTermSet = qterms.select(col("term")).distinct()
    val qIdf = idf.drop("df")
      .join(if (hintable) broadcast(qTermSet) else qTermSet, Seq("term"), "left_semi")
    val idfSide = if (hintable) broadcast(qIdf) else qIdf
    tf.join(qtSide, "term")
      .join(idfSide, "term")
      // Per-(term, doc) contribution in micro-points: idf_micro is the
      // already-integer micro-nats idf, so idf_micro * tfpart IS the
      // contribution scaled by 1e6 — snap once and sum exactly. dl
      // rides on tf, so no per-doc join re-enters the candidate stream.
      .select(col("query_id"), col("doc_id"),
        contribMicro(col("tf"), col("dl"), lit(avgdl),
          col("idf_micro"), k1, b).as("c_micro"))
  }

  /** The `k` best docs per query by BM25: (query_id, doc_id, rank,
    * score_micro), rank 1..k by (score desc, doc_id asc) — fully
    * deterministic via the integer score. Bounded-heap reduction, no
    * window sort.
    */
  def topDocs(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.5,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      queryTextCol: String = "text",
      queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // Fused sum+rank: the (query, doc) keys of the contribution stream
    // are near-unique (most docs match a query on one term), so the old
    // groupBy-then-rankTopK shape paid a no-op partial aggregation plus
    // a second exchange; the fused pass shuffles once by query_id and
    // streams exact long sums into the bounded heap — identical rows
    // (long sums are order-free, same (score desc, doc_id asc) ties).
    Similarity.sumRankTopKMicro(
      contribs(docs, queries, k1, b, textCol, idCol, queryTextCol, queryIdCol), k)
  }

  /** Reciprocal-rank fusion of N rankings (Cormack et al. 2009):
    * rrf(d) = sum over rankings of 1/(k0 + rank_i(d)), the standard
    * way to fuse lexical (BM25) and vector (ANN) retrieval without
    * score calibration. Each input is a (query_id, doc_id, rank)
    * frame (extra columns ignored; absent docs contribute 0).
    *
    * Portable by the same fixed-point discipline: each ranking's
    * contribution `1e6/(k0 + rank)` is one exact IEEE division
    * snapped to integer micro-points, and the fusion sum is an
    * integer sum — orderless, engine-exact. Returns (query_id,
    * doc_id, n_lists, rrf_micro) for every doc present in at least
    * one ranking.
    *
    * Scale shape: inputs are per-query top-N frames (Q x N rows each),
    * so the union + one groupBy is bounded by the fused depth, never
    * the corpus.
    */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    val tagged = rankings.map(r =>
      r.select(col("query_id").cast("long"), col("doc_id").cast("long"),
        floor(lit(1000000.0) / (lit(k0).cast("double") + col("rank").cast("double")) +
          lit(0.5)).cast("long").as("c_micro")))
    tagged.reduce(_.unionByName(_))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_lists"), sum("c_micro").as("rrf_micro"))
  }

  /** The `k` best docs per query after RRF fusion: (query_id, doc_id,
    * rank, n_lists, rrf_micro), rank by (rrf desc, doc_id asc).
    */
  def fuseTopK(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // Fused sum+rank over the per-list contribution stream: one
    // exchange computes the exact rrf sums, the list count AND the
    // bounded top-k rank — the old shape aggregated, ranked (two more
    // exchanges) and then JOINED the ranks back to the aggregate to
    // recover (n_lists, rrf_micro). Identical rows: integer sums are
    // order-free and the heap keeps rankTopK's (score desc, doc_id asc)
    // tie contract.
    val tagged = rankings.map(r =>
      r.select(col("query_id").cast("long"), col("doc_id").cast("long"),
        floor(lit(1000000.0) / (lit(k0).cast("double") + col("rank").cast("double")) +
          lit(0.5)).cast("long").as("c_micro")))
    Similarity.sumRankTopKFusion(tagged.reduce(_.unionByName(_)), k)
  }
}
