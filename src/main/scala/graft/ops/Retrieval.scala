package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid retrieval over the persisted serving indexes — the query-time
  * face of the tier: [[Bm25Index]] answers the lexical ranking,
  * [[AnnIndex]] the vector ranking, [[Bm25.rrf]] fuses them with
  * integer micro-point reciprocal-rank contributions. No corpus pass
  * happens at query time; the whole probe is two pruned index scans
  * plus a fusion over per-query top-`depth` frames.
  *
  * This is the composition `q_hybrid_index` holds to the DuckDB gate
  * (both rankings and the fusion replayed exactly at full ANN probe
  * depth), packaged as one call so a pipeline doesn't re-derive the
  * plumbing.
  */
object Retrieval {

  /** Top-k fused results per query: (query_id, doc_id, rank, n_lists,
    * rrf_micro). `queries` carries BOTH modalities — the query text
    * (`textCol`) and its embedding (`vecCol`) under one `idCol`; doc
    * ids and vector ids must share the key space (build the ANN index
    * over [[graft.ops.TextAnalysis.keyedChunks]] keys or doc-level
    * embeddings keyed by doc_id).
    *
    * `depth` is the per-ranker pool fused (top-`depth` from each side
    * — fusion cost is Q·depth·2, never corpus-shaped); `nProbe` is the
    * ANN probe depth (raise toward the cell count for recall, or pass
    * the cell count for the exact vector ranking); `filter` applies to
    * BOTH indexes' scans when given (each stores the metadata columns
    * beside its rows — declare the same `metaCols` at both builds).
    *
    * `excludeSelf` — an ID-COLLISION HAZARD to decide consciously: the
    * vector side inherits [[AnnIndex.topK]]'s self-exclusion
    * (`query_id != neighbor_id`), the lexical side has no such notion.
    * When query ids and doc ids share a key space (docs-as-queries —
    * this library's oracles) the default true is what you want: the
    * trivial self-hit is dropped from BOTH the vector pool (by the
    * filter) and effectively demoted in fusion. But when queries are
    * NOT corpus members and merely happen to collide numerically
    * (query 42 vs doc 42 — common for small integer ids), true
    * silently drops doc 42 from query 42's VECTOR ranking while the
    * lexical side keeps it, skewing that query's fusion. Pass false
    * there — ids in different key spaces must never interact.
    *
    * The lexical half's probe knobs pass straight through to
    * [[Bm25Index.topDocs]] — `k1`/`b` retune the scoring (free: the
    * index stores raw tf/dl/df), `maxDfFrac` caps stopword fan-out,
    * `prune` toggles MaxScore dynamic pruning — so a serving caller
    * tunes the fused ranking without bypassing the operator.
    */
  def hybridTopK(
      spark: SparkSession,
      bm25Dir: String,
      annDir: String,
      queries: DataFrame,
      k: Int,
      depth: Int = 20,
      nProbe: Int = 8,
      k0: Int = 60,
      idCol: String = "query_id",
      textCol: String = "text",
      vecCol: String = "embedding",
      filter: Option[Column] = None,
      excludeSelf: Boolean = true,
      k1: Double = 1.5,
      b: Double = 0.75,
      maxDfFrac: Double = 1.0,
      prune: Boolean = true): DataFrame = {
    require(k >= 1 && depth >= k, s"need depth >= k >= 1: k=$k, depth=$depth")
    val lex = Bm25Index.topDocs(spark, bm25Dir,
        queries.select(col(idCol).as("query_id"), col(textCol).as("text")),
        k = depth, k1 = k1, b = b, filter = filter, maxDfFrac = maxDfFrac,
        prune = prune)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val vec = AnnIndex.topK(spark, annDir,
        queries.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        k = depth, nProbe = nProbe, filter = filter, excludeSelf = excludeSelf)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    Bm25.fuseTopK(Seq(lex, vec), k, k0)
  }
}
