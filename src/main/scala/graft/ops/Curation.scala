package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the canonical LLM training-data flow
  * composed from this library's individually-oracled primitives —
  * language ID → quality/repetition filtering → PII scrub → exact
  * dedup → near-dedup (MinHash/LSH + connected components) → optional
  * substring dedup (keep-one span removal) → benchmark decontamination
  * → domain re-weighting → sequence packing.
  *
  * Every stage is a doc_id-keyed filter or transform, so the whole
  * pipeline is a chain of semi-joins over the (ever-shrinking) survivor
  * set: at 100 TB the expensive stages (near-dedup banding, gram
  * semi-join) already have sub-quadratic distributed shapes, and the
  * cheap ones fold into scans. Stage order follows standard practice:
  * cheap row-local filters first so the pairwise stages see the
  * smallest possible corpus.
  */
object Curation {

  /** Pipeline configuration; defaults are permissive enough for the
    * synthetic corpora and illustrate every stage.
    */
  final case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.0,
      maxDupTrigramFrac: Double = 1.0,
      nearDupThreshold: Double = 0.9,
      mixtureRates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      packBudget: Long = 2048L,
      packShards: Int = 64,
      /** When set, rewrite survivors' text with [[SubstringDedup
        * .removeDuplicatedSpans]] at this window length after
        * near-dedup — document counts are unchanged, duplicated
        * substrings keep one canonical copy corpus-wide.
        */
      substringMinTokens: Option[Int] = None,
      /** When set, rewrite survivors' text with [[LineDedup
        * .removeDuplicatedLines]] at this occurrence threshold BEFORE
        * document-level dedup — C4-style boilerplate lines (footers,
        * banners) vanish first, so they can no longer glue unrelated
        * documents into near-duplicate clusters.
        */
      lineDedupMinCount: Option[Int] = None,
      /** When set, keep only documents at or above this corpus
        * quality QUANTILE (e.g. 0.25 drops the worst quarter) — the
        * auto-tuned alternative to the absolute `minQuality` cutoff;
        * both may be active. Uses the mergeable approximate
        * percentile (the 100 TB path).
        */
      qualityQuantile: Option[Double] = None,
      /** When set, the input `text` column is raw crawl HTML: run
        * [[HtmlExtract.extractText]] (markup strip + boilerplate-line
        * drop at this min-words-per-line) BEFORE every other stage.
        * Row-local (no shuffle, no state), so it applies identically
        * per micro-batch in the streaming pipeline.
        */
      htmlExtractMinWords: Option[Int] = None,
      /** When set, keep only documents whose corpus-LM cross-entropy
        * (nats/token, [[LanguageModel.filterByPerplexity]]) lies in
        * [lo, hi] — the CCNet band filter: too low = boilerplate, too
        * high = gibberish. The LM trains on the post-row-filter
        * survivors (corpus-level state, so this stage is batch-only;
        * a streaming run should train the vocab offline).
        */
      perplexityBand: Option[(Double, Double)] = None,
      perplexityMinCount: Long = 2L)

  /** Curated output: the packed corpus plus a per-stage survivor-count
    * report (stage, rows) in pipeline order.
    */
  final case class Result(packed: DataFrame, report: Seq[(String, Long)])

  /** The stateless per-row stages — language, quality, repetition
    * filters, then PII scrub. Pure scans (no shuffle, no state), so
    * they apply unchanged to a whole corpus or to one micro-batch.
    */
  def rowStages(input0: DataFrame, cfg: Config): DataFrame = {
    // 0a. HTML → text (optional): the crawl-ingestion transform. First
    //     because every downstream signal (language, quality, dedup
    //     shingles) must see prose, not markup.
    val input = cfg.htmlExtractMinWords match {
      case Some(m) => HtmlExtract.extract(input0, htmlCol = "text", outCol = "text", m)
      case None => input0
    }
    val lang = TextAnalysis.languageId(input)
      .filter(col("pred_lang").isInCollection(cfg.langs)).select("doc_id")
    val quality = TextAnalysis.qualityScore(input)
      .filter(col("quality") >= cfg.minQuality).select("doc_id")
    val lowRep = TextAnalysis.repetitionSignals(input)
      .filter(col("dup_trigram_frac") <= cfg.maxDupTrigramFrac).select("doc_id")
    TextAnalysis.scrubPii(
      input.join(lang, "doc_id").join(quality, "doc_id").join(lowRep, "doc_id"))
  }

  /** Percentile-threshold filter — the auto-tuned form of a fixed
    * cutoff ("keep the top half by quality" instead of guessing
    * `minQuality`), standard practice when a score's absolute scale
    * drifts between crawls but its ranking is trustworthy. The
    * threshold is the corpus p-quantile of `valueCol`; `keepUpper`
    * keeps values >= it (ties INCLUDED on both modes — a threshold
    * filter must not split equal scores).
    *
    * `exact = false` (default, the 100 TB path) uses the mergeable GK
    * sketch (`percentile_approx`): one map-side-combinable pass,
    * bounded memory. `exact = true` uses the exact interpolated
    * percentile, which buffers the value column per aggregation
    * buffer — fine to ~10^8 rows, and what an engine-to-engine
    * equality check needs. Either way the threshold joins back as a
    * broadcast literal: one scan, one tiny agg, no corpus shuffle.
    */
  def filterByQuantile(
      df: DataFrame, valueCol: String, p: Double,
      keepUpper: Boolean = true, exact: Boolean = false): DataFrame = {
    require(p > 0.0 && p < 1.0, s"quantile must be in (0, 1): $p")
    val th =
      if (exact) org.apache.spark.sql.functions.percentile(col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(10000))
    // The threshold is corpus-level state, like k-means centers: one
    // tiny aggregate action, then a literal filter. (A 1-row cross
    // join would keep the plan lazy but compiles to the
    // BroadcastNestedLoopJoin shape PlanAuditSpec forbids — and a
    // literal filter is the better plan anyway: pushdown-able,
    // join-free.)
    val row = df.agg(th.cast("double").as("qf_th")).head()
    if (row.isNullAt(0)) df.where(lit(false)) // empty input: no threshold
    else {
      val threshold = row.getDouble(0)
      df.where(if (keepUpper) col(valueCol) >= threshold
               else col(valueCol) <= threshold)
    }
  }

  /** Run the full pipeline. `benchmark` (optional) enables the
    * decontamination stage. NOTE: the report counts force one action
    * per stage — this is a curation job, not an interactive query; at
    * scale the counts come free with each stage's shuffle anyway.
    */
  def curate(
      docs: DataFrame,
      cfg: Config = Config(),
      benchmark: Option[DataFrame] = None): Result = {
    val report = collection.mutable.ArrayBuffer.empty[(String, Long)]
    def stage(name: String, df: DataFrame): DataFrame = {
      report += name -> df.count(); df
    }

    val input = stage("input", docs.select(col("doc_id"), col("text"), col("source")))

    // 0. Line dedup (optional): a TRANSFORM before everything else —
    //    shared boilerplate lines keep one copy corpus-wide, so they
    //    cannot glue unrelated documents into near-dup clusters and
    //    they stop polluting the quality/repetition signals below.
    val lineDeduped = cfg.lineDedupMinCount match {
      case Some(m) =>
        val cleaned = LineDedup.removeDuplicatedLines(input, m)
          .select(col("doc_id"), col("clean_text").as("text"))
        stage("line_dedup", input.drop("text").join(cleaned, "doc_id"))
      case None => input
    }

    // 1.+2. Row-local filters + PII scrub (shared with the streaming
    // variant, so micro-batch and whole-corpus runs apply literally the
    // same predicates).
    val scrubbed0 = rowStages(lineDeduped, cfg)
    // 1b. Quantile quality cutoff (optional): threshold = the corpus
    //     p-quantile of the quality score — corpus-level state (one
    //     tiny agg + broadcast), so like the perplexity band it is a
    //     batch-stage; streaming runs pin the threshold offline.
    val scrubbed = cfg.qualityQuantile match {
      case Some(p) =>
        val q = TextAnalysis.qualityScore(scrubbed0).select("doc_id", "quality")
        scrubbed0.join(
          filterByQuantile(q, "quality", p).select("doc_id"), "doc_id")
      case None => scrubbed0
    }
    stage("row_filters", scrubbed)

    // 2b. Perplexity band (optional): corpus-LM outlier filter. The
    //     vocab groupBy is the only corpus-level state; scoring is a
    //     shuffle-free map over the survivors.
    val banded = cfg.perplexityBand match {
      case Some((lo, hi)) =>
        stage("perplexity_band",
          LanguageModel.filterByPerplexity(scrubbed, lo, hi, cfg.perplexityMinCount))
      case None => scrubbed
    }

    // 3. Exact dedup: keep the minimum doc_id of each normalized text.
    val keepExact = Dedup.exactDedup(banded).select(col("keep_id").as("doc_id"))
    val exact = stage("exact_dedup", banded.join(keepExact, "doc_id"))

    // 4. Near-dedup: LSH candidate pairs -> verified pairs -> cluster
    //    reps; drop every non-representative member.
    val pairs = Dedup.nearDuplicatePairs(exact, threshold = cfg.nearDupThreshold)
    val reps = Dedup.connectedComponents(pairs.select(col("doc_a"), col("doc_b")))
    val dropIds = reps.filter(col("doc_id") =!= col("rep_id")).select("doc_id")
    val nearDeduped = stage("near_dedup", exact.join(dropIds, Seq("doc_id"), "left_anti"))

    // 4b. Substring dedup (optional): a TRANSFORM, not a filter — the
    //     survivor set is unchanged but duplicated >= L-token spans
    //     keep exactly one canonical copy across the whole corpus.
    //     Runs after the document-level dedups so the window table is
    //     built over the smallest corpus.
    val subDeduped = cfg.substringMinTokens match {
      case Some(l) =>
        val cleaned = SubstringDedup.removeDuplicatedSpans(nearDeduped, l)
          .select(col("doc_id"), col("clean_text").as("text"))
        stage("substring_dedup", nearDeduped.drop("text").join(cleaned, "doc_id"))
      case None => nearDeduped
    }

    // 5. Decontamination (optional): drop docs sharing 5-grams with the
    //    benchmark.
    val clean = benchmark match {
      case Some(b) =>
        val flags = Contamination.flagContamination(subDeduped, b)
        stage("decontaminated",
          subDeduped.join(flags.filter(!col("contaminated")).select("doc_id"), "doc_id"))
      case None => subDeduped
    }

    // 6. Domain re-weighting, then 7. sequence packing.
    val mixed = stage("mixture",
      Sampling.mixtureSample(clean, "source", "doc_id", cfg.mixtureRates, cfg.defaultRate))
    val packed = Packing.packSequences(
      mixed.withColumn("n_toks", TextAnalysis.tokenCount(col("text")).cast("long")),
      "n_toks", cfg.packBudget, cfg.packShards)
    val out = stage("packed", packed)
    Result(out, report.toSeq)
  }
}
