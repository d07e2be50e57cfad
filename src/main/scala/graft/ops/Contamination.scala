package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-decontamination scan: flag training documents that share
  * verbatim token k-grams with an evaluation/benchmark set (the standard
  * n-gram-overlap contamination check, e.g. GPT-3 appendix C / PaLM
  * §C.2 style — k consecutive tokens in common = contaminated).
  *
  * Scale shape (100 TB corpus, benchmark ≪ corpus): the benchmark's
  * distinct gram set is broadcast, so the corpus side is a map-side
  * BroadcastHashJoin over exploded grams — the full corpus never
  * shuffles; only the (rare) matched gram rows reach the per-doc count
  * aggregation, and the final join back to per-doc totals is
  * doc_id-keyed on the already-small analysis frame. For a benchmark
  * too large to broadcast, pass `broadcastBenchmark = false` to fall
  * back to a hash semi-join partitioned on the gram.
  */
object Contamination {

  /** Per-corpus-doc overlap with the benchmark gram set:
    * (doc_id, n_grams, n_overlap_grams, contaminated). `n_grams` counts
    * the doc's DISTINCT k-grams; `n_overlap_grams` of them appear
    * anywhere in the benchmark; `contaminated` = any overlap. Docs
    * shorter than k tokens have zero grams and are never contaminated.
    */
  /** The contaminated k-token windows of each corpus doc: every
    * (doc_id, start) whose window content appears verbatim anywhere in
    * the benchmark. Matching is on the 64-bit [[SubstringDedup
    * .windowFingerprints]] content hash — the benchmark side is
    * hashes-only and tiny, so it broadcasts and the corpus never
    * shuffles (the [[flagContamination]] scale shape, at window
    * granularity).
    */
  def contaminatedWindows(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastBenchmark: Boolean = true): DataFrame = {
    val wins = SubstringDedup.windowFingerprints(corpus, k, textCol, idCol)
    val bench0 = SubstringDedup.windowFingerprints(benchmark, k, textCol, idCol)
      .select(col("key")).distinct()
    val bench = if (broadcastBenchmark) broadcast(bench0) else bench0
    wins.join(bench, Seq("key"), "left_semi").select(col("doc_id"), col("start"))
  }

  /** Span-level decontamination report: maximal token spans (half-open
    * offsets) of corpus docs that verbatim-overlap the benchmark —
    * (doc_id, span_start, span_end, n_dup_windows). The scrub-not-drop
    * alternative to [[flagContamination]]'s document verdict: a 10k-token
    * document with one quoted benchmark item loses a span, not its
    * entire signal.
    */
  def contaminatedSpans(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastBenchmark: Boolean = true): DataFrame =
    SubstringDedup.spansFromWindows(
      contaminatedWindows(corpus, benchmark, k, textCol, idCol, broadcastBenchmark), k)

  /** Rewrite corpus text with every contaminated span removed (ALL
    * matched windows are cut — no keep-one exemption: benchmark text
    * has no canonical copy that belongs in training data). Output
    * (doc_id, clean_text, n_removed_tokens), one row per corpus doc.
    */
  def scrubContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastBenchmark: Boolean = true): DataFrame =
    SubstringDedup.removeCovered(
      corpus,
      contaminatedWindows(corpus, benchmark, k, textCol, idCol, broadcastBenchmark),
      k, textCol, idCol)

  def flagContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastBenchmark: Boolean = true): DataFrame = {
    val grams = array_distinct(TextAnalysis.tokenGrams(TextAnalysis.tokens(col(textCol)), k))
    val benchGrams0 = benchmark.select(explode(grams).as("gram")).distinct()
    val benchGrams = if (broadcastBenchmark) broadcast(benchGrams0) else benchGrams0
    val corpusGrams = corpus.select(col(idCol).cast("long").as("doc_id"), explode(grams).as("gram"))
    val overlap = corpusGrams
      .join(benchGrams, Seq("gram"), "left_semi")
      .groupBy("doc_id")
      .agg(count("*").as("n_overlap_grams"))
    corpus
      .select(col(idCol).cast("long").as("doc_id"), size(grams).cast("long").as("n_grams"))
      .join(overlap, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_overlap_grams"), lit(0L)).as("n_overlap_grams"),
        (coalesce(col("n_overlap_grams"), lit(0L)) > 0L).as("contaminated"))
  }
}
