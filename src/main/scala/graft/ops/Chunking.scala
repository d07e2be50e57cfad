package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passage chunking — the step between a document corpus and the
  * embedding/retrieval tier: RAG pipelines embed CHUNKS, not documents
  * (embedding models cap input length; retrieval granularity wants
  * passages), so chunking sits directly upstream of [[AnnIndex.build]]
  * and of every per-passage quality filter.
  *
  * Deterministic, engine-portable sliding token windows: tokens are the
  * shared whitespace tokenizer ([[TextAnalysis.tokens]] — the same
  * identity BM25/TF-IDF/token counts use), window starts are
  * `0, stride, 2*stride, ...` for `stride = size - overlap` while
  * `start < n_tokens`, and each chunk is the space-joined slice
  * `[start, min(start+size, n))`. Chunk ids are `start / stride` —
  * stable under any layout, so chunk keys `(doc_id, chunk_id)` are
  * join-safe across runs and engines. A document shorter than `size`
  * yields exactly one chunk (itself). No UDFs: `sequence` + `explode` +
  * `slice` + `concat_ws`, all codegen'd, one narrow pass — chunking
  * 100 TB is a map-only job that parallelizes per input split.
  *
  * Scale note: `explode` multiplies rows by ~n_tokens/stride, so chunk
  * output is (1 + overlap/stride)× the token volume of the corpus —
  * size the downstream shuffle partitions for CHUNK count, not doc
  * count ([[AnnIndex.build]]'s auto ~sqrt(N) cell sizing already keys
  * off the row count it receives).
  */
object Chunking {

  /** (doc_id, chunk_id, chunk_start, n_toks, text) — overlapping token
    * windows of `size` tokens every `size - overlap` tokens. Extra
    * metadata columns in `docs` are NOT carried (select + join back on
    * doc_id when needed — cheaper than widening every exploded row).
    */
  def tokenWindows(
      docs: DataFrame,
      size: Int,
      overlap: Int = 0,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(size >= 1, s"size must be >= 1: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): overlap=$overlap, size=$size")
    val stride = size - overlap
    val toks = col("toks")
    val n = org.apache.spark.sql.functions.size(toks)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      // starts 0, stride, ... <= n-1 (n >= 1 always: an empty text
      // tokenizes to [""], one empty chunk — the BM25/TF-IDF identity)
      .withColumn("chunk_start",
        explode(sequence(lit(0), greatest(n - 1, lit(0)), lit(stride))))
      .select(
        col("doc_id"),
        (col("chunk_start") / stride).cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        (least(col("chunk_start") + size, n) - col("chunk_start"))
          .cast("long").as("n_toks"),
        concat_ws(" ", slice(toks, col("chunk_start") + 1, lit(size))).as("text"))
  }

  /** Chunks keyed for the vector tier: [[tokenWindows]] plus a single
    * collision-free long key `chunk_key = doc_id * maxChunks + chunk_id`
    * usable as [[AnnIndex.build]]'s `vec_id` — and invertible
    * (`doc_id = chunk_key / maxChunks`), so retrieval results map back
    * to documents WITHOUT a join. Fails loudly when a document chunks
    * past `maxChunks` or the key would overflow a long.
    */
  def keyedTokenWindows(
      docs: DataFrame,
      size: Int,
      overlap: Int = 0,
      maxChunks: Long = 1000000L,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(maxChunks >= 1, s"maxChunks must be >= 1: $maxChunks")
    val chunks = tokenWindows(docs, size, overlap, textCol, idCol)
    // The guard wraps the key expression itself: under ANSI mode the
    // raw multiplication would throw ARITHMETIC_OVERFLOW before any
    // separate check column evaluates — `when` keeps the multiply in
    // the safe branch, so the loud failure names the doc.
    val key = when(
      col("chunk_id") >= maxChunks ||
        abs(col("doc_id")) > lit(Long.MaxValue / maxChunks - 1),
      raise_error(concat(lit(s"chunk_key overflow (maxChunks=$maxChunks) for doc "),
        col("doc_id").cast("string"))).cast("long"))
      .otherwise(col("doc_id") * maxChunks + col("chunk_id"))
    chunks.select(
      key.as("chunk_key"),
      col("doc_id"), col("chunk_id"), col("chunk_start"), col("n_toks"), col("text"))
  }
}
