package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus "data card": the per-slice statistical summary every
  * training-data release ships (Gebru et al., "Datasheets for
  * Datasets", CACM 2021; the Pile/ROOTS data cards) — document and
  * token counts, size quantiles, exact-duplicate rate, quality-signal
  * means per (source, lang) slice, plus corpus-share columns.
  *
  * One aggregation pass over the corpus (map-side combined), one tiny
  * window over the slice table for shares — no joins against the
  * corpus, no per-slice actions, so the card costs the same at 100 TB
  * as the cheapest full scan. Everything emitted is exact integer or
  * fixed-rounded arithmetic: the whole card is SQL-recomputable, which
  * makes it a HARD oracle (`q_datacard`), not a report nobody checks.
  */
object DataCard {

  /** Per-(source, lang) slice summary. Columns:
    *   - n_docs, n_tokens, n_chars — exact counts;
    *   - doc_share, token_share — slice fraction of the corpus
    *     (rounded 6dp);
    *   - p50_tokens, p90_tokens — exact rank-statistic token counts
    *     (type-1 / inverse-CDF quantiles: portable, no interpolation);
    *   - n_dup_docs — docs whose normalized text appears more than
    *     once CORPUS-WIDE (the slice's share of exact-duplicate mass);
    *   - mean_quality — mean of the [[TextAnalysis.qualityScore]]
    *     signal (rounded 4dp; the per-doc signal is itself
    *     fixed-rounded, so the mean is stable to well below 4dp).
    */
  def card(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = split(Dedup.normalizeText(col(textCol)), " ")
    val base = docs.select(
      col("doc_id"), col("source"), col("lang"),
      when(Dedup.normalizeText(col(textCol)) === "", 0L)
        .otherwise(size(toks).cast("long")).as("n_toks"),
      length(Dedup.normalizeText(col(textCol))).cast("long").as("n_chars"),
      md5(Dedup.normalizeText(col(textCol))).as("text_hash"))

    // Corpus-wide duplicate mass: normalized-text hashes seen > once.
    val dupHashes = base.groupBy($"text_hash").agg(count(lit(1)).as("c"))
      .filter($"c" > 1).select($"text_hash", lit(true).as("is_dup"))

    val quality = TextAnalysis.qualityScore(docs.select(col("doc_id"), col(textCol).as("text")))
      .select($"doc_id", $"quality")

    val perDoc = base
      .join(dupHashes, Seq("text_hash"), "left")
      .join(quality, "doc_id")
      .select($"source", $"lang", $"n_toks", $"n_chars",
        coalesce($"is_dup", lit(false)).as("is_dup"), $"quality")

    // Scalar aggregates in one pass. mean_quality sums the 4dp quality
    // as INTEGER ten-thousandths (floor(q*1e4 + 0.5), exact for 4dp
    // doubles) so the mean is summation-order-independent — a rounded
    // AVG of doubles would be the one FP trap in the card.
    val agg1 = perDoc
      .groupBy($"source", $"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_toks").as("n_tokens"),
        sum($"n_chars").as("n_chars"),
        sum(when($"is_dup", 1L).otherwise(0L)).as("n_dup_docs"),
        sum(floor($"quality" * 10000 + 0.5).cast("long")).as("q4_sum"))
      .withColumn("mean_quality",
        round($"q4_sum" / $"n_docs" / 10000.0, 4))
      .drop("q4_sum")

    // Type-1 (inverse-CDF) quantiles: the ceil(p*n)-th smallest n_toks
    // per slice = the smallest VALUE whose cumulative count reaches
    // ceil(p*n). Counting per distinct value first (map-side-combined
    // hash agg — a billion-doc slice collapses before the exchange)
    // bounds the per-slice window input by the number of DISTINCT
    // token counts (<= max doc length), not the doc count — the
    // previous per-DOC rank window put a mega slice's every row into
    // one sort task.
    val counts = perDoc
      .groupBy($"source", $"lang", $"n_toks")
      .agg(count(lit(1)).as("c"))
    val cumW = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"lang").orderBy($"n_toks")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val quantiles = counts
      .withColumn("cum", sum($"c").over(cumW))
      .join(agg1.select($"source", $"lang", $"n_docs"), Seq("source", "lang"))
      .groupBy($"source", $"lang")
      .agg(
        min(when($"cum" >= ceil($"n_docs" * 0.5), $"n_toks")).as("p50_tokens"),
        min(when($"cum" >= ceil($"n_docs" * 0.9), $"n_toks")).as("p90_tokens"))
    // cum always reaches ceil(p*n) <= n at the largest value, so both
    // columns are total (the n=1 edge included).
    val slices = agg1.join(quantiles, Seq("source", "lang"))

    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    slices
      .withColumn("doc_share", round($"n_docs" / sum($"n_docs").over(w), 6))
      .withColumn("token_share", round($"n_tokens" / sum($"n_tokens").over(w), 6))
      .select($"source", $"lang", $"n_docs", $"n_tokens", $"n_chars",
        $"doc_share", $"token_share", $"p50_tokens", $"p90_tokens",
        $"n_dup_docs", $"mean_quality")
  }
}
