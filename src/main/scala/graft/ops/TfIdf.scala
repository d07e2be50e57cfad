package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics term weighting: per-document distinctive terms by
  * tf/df weight (term frequency over corpus document frequency — the
  * idf factor expressed as an exact IEEE division instead of a log, so
  * any engine recomputes bit-identical scores; `ln` differs across libm
  * implementations in the last ulp, which a hash-compare would see).
  *
  * Scale shape: tf is one map-side-combined groupBy over the exploded
  * token stream (the only corpus-sized shuffle); df aggregates the
  * already-small tf table; the df (vocabulary) table is broadcast back
  * — natural-language vocabularies are tiny relative to any corpus
  * (Heaps' law), so the re-join never shuffles the tf side. The final
  * per-doc rank windows over the tf table partitioned by doc — rows per
  * partition = the doc's distinct terms, never the corpus.
  */
object TfIdf {

  /** Per-doc-term weights: (doc_id, term, tf, df, score) with
    * score = tf/df rounded to 6 dp. `broadcastVocab = false` falls back
    * to a hash join for degenerate vocabularies too large to broadcast.
    */
  def termWeights(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastVocab: Boolean = true): DataFrame = {
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count("*").as("tf"))
    val vocab0 = tf.groupBy("term").agg(count("*").as("df"))
    val vocab = if (broadcastVocab) broadcast(vocab0) else vocab0
    tf.join(vocab, Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf").cast("double") / col("df"), 6).as("score"))
  }

  /** The k most distinctive terms per doc: rank by (tf/df desc, term
    * asc) — fully deterministic, ASCII-binary tie-break on the term.
    * Returns (doc_id, term, tf, df, score, rank), rank 1..k.
    */
  def topTerms(
      docs: DataFrame,
      k: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastVocab: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val weighted = termWeights(docs, textCol, idCol, broadcastVocab)
    // Rank on the unrounded ratio (exact IEEE division, engine-portable)
    // so display rounding can never reorder near-ties.
    val w = Window.partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
    weighted
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
