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
      filter: Option[Column] = None): DataFrame = {
    require(k >= 1 && depth >= k, s"need depth >= k >= 1: k=$k, depth=$depth")
    val lex = Bm25Index.topDocs(spark, bm25Dir,
        queries.select(col(idCol).as("query_id"), col(textCol).as("text")),
        k = depth, filter = filter)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val vec = AnnIndex.topK(spark, annDir,
        queries.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        k = depth, nProbe = nProbe, filter = filter)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    Bm25.fuseTopK(Seq(lex, vec), k, k0)
  }
}
