package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication: find (and optionally remove) every
  * token span of length >= `minTokens` whose content occurs more than
  * once in the corpus — the ExactSubstr cleanup of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" (ACL
  * 2022). The reference engine has no substring-level dedup (its dedup
  * surface is document-level, `/root/reference/README.md`); this is
  * part of the LLM-curation layer the survey calls for alongside
  * MinHash/SimHash document dedup.
  *
  * Design (Spark-first, no suffix array): a span of length >= L is
  * duplicated iff every one of its L-token windows is duplicated, so
  * the duplicated-span set is exactly the per-document merge of the
  * duplicated L-windows. That turns the suffix-array step of the paper
  * into three declarative stages, each shuffle-bounded:
  *
  *   1. window fingerprints — one row per L-token window, built with
  *      codegen'd array builtins (`transform`/`slice`/`xxhash64`), no
  *      shuffle, O(total tokens) rows;
  *   2. duplicate keys — `groupBy(key).count >= 2`: ONE hash shuffle on
  *      an 8-byte key with map-side partial counts; the join back to
  *      the window table hash-partitions on the same key, so AQE plans
  *      it against the tiny filtered side;
  *   3. span merge — gaps-and-islands per document (two window
  *      functions over ONE `doc_id` shuffle), merging overlapping or
  *      back-to-back windows into maximal spans.
  *
  * At 100 TB the window table is ~#tokens rows of (long, int, long) —
  * the same asymptotics as the paper's suffix array but embarrassingly
  * partitioned; no stage collects to the driver and no stage is
  * quadratic (the candidate explosion of naive pair joins cannot occur
  * because windows are never self-joined, only counted).
  *
  * The 64-bit content hash is the scale path; at corpus sizes where
  * 2^-64 birthday collisions matter (~2^32 distinct windows ≈ 4B), the
  * `keyCol` can be widened to the full window string by callers — the
  * DuckDB oracle groups on the raw content and agrees with the hashed
  * plan exactly on the test corpora.
  */
object SubstringDedup {

  /** One row per L-token window: (doc_id, start, key).
    * `start` is the 0-based token offset; `key` is `xxhash64` of the
    * space-joined window content. Documents shorter than L contribute
    * no rows. Pure builtins — a single WholeStageCodegen span over the
    * scan, no shuffle.
    */
  def windowFingerprints(
      docs: DataFrame, minTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2: $minTokens")
    val w = minTokens
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(
        when(size(col("t")) >= w,
          transform(sequence(lit(0), size(col("t")) - w), i =>
            struct(i.as("start"),
              xxhash64(concat_ws(" ", slice(col("t"), i + 1, lit(w)))).as("key"))))
          .otherwise(array().cast("array<struct<start:int,key:bigint>>")))
        .as("win"))
      .select(col("doc_id"), col("win.start").as("start"), col("win.key").as("key"))
  }

  /** The duplicated windows: every (doc_id, start) whose L-token window
    * content occurs >= 2 times corpus-wide (within-document repeats
    * count, as in the paper). The count shuffles only map-side partial
    * counts; the filtered duplicate-key side is small enough that the
    * planner broadcasts it back (observed plan: BroadcastHashJoin,
    * BuildRight), so the token-scale window table itself is never
    * shuffled on `key` — and if a pathological corpus makes the dup set
    * huge, AQE degrades to a sort-merge join, never to a blowup.
    */
  def duplicatedWindows(
      docs: DataFrame, minTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    rankedDuplicatedWindows(docs, minTokens, textCol, idCol)
      .select(col("doc_id"), col("start"))

  /** [[duplicatedWindows]] plus the occurrence's keep-one flag (`kept`
    * marks the canonical smallest (doc_id, start) of its window key):
    * the one intermediate both the span report (all rows) and the
    * keep-one removal (`!kept`) consume — callers that run both
    * materialize this once.
    *
    * Skew-immune shape: occurrence count and keeper come from a
    * map-side-combinable hash aggregation on `key` (a window repeated
    * 10^9 times corpus-wide collapses to one row per map task before
    * the exchange), joined back onto the occurrences — a shuffle join
    * AQE skew-splitting can divide, unlike the
    * `Window.partitionBy(key)` this replaces, which serialized every
    * occurrence of the hottest key onto ONE un-splittable WindowExec
    * sort. The fingerprint frame (the biggest table in the library) is
    * eagerly localCheckpoint'ed so the join's two branches share one
    * fingerprint pass — eager because a lazy checkpoint lets the two
    * independent shuffle-map stages race and each compute the frame
    * before the other's blocks land.
    */
  def rankedDuplicatedWindows(
      docs: DataFrame, minTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val wins = windowFingerprints(docs, minTokens, textCol, idCol)
      .localCheckpoint()
    val agg = wins.groupBy(col("key"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("start"))).as("keeper"))
      .where(col("occ") >= 2)
    wins.join(agg, Seq("key"))
      .select(col("doc_id"), col("start"),
        (col("keeper.doc_id") === col("doc_id") &&
          col("keeper.start") === col("start")).as("kept"))
  }

  /** Maximal duplicated spans per document: merge overlapping or
    * back-to-back duplicated windows ([s, s+L) and [s', s'+L) merge
    * when s' <= s + L) into (doc_id, span_start, span_end,
    * n_dup_windows), half-open token offsets. Gaps-and-islands on one
    * `doc_id` shuffle.
    */
  def duplicatedSpans(
      docs: DataFrame, minTokens: Int = 50,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    spansFromWindows(duplicatedWindows(docs, minTokens, textCol, idCol), minTokens)

  /** The span-merge kernel of [[duplicatedSpans]] over a prebuilt
    * `(doc_id, start)` duplicated-window frame.
    */
  def spansFromWindows(dupWindows: DataFrame, minTokens: Int): DataFrame = {
    val w = minTokens
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    dupWindows
      .select(col("doc_id"), col("start"))
      .withColumn("newSpan",
        when(col("start") > lag(col("start"), 1).over(byDoc) + w, 1)
          .when(lag(col("start"), 1).over(byDoc).isNull, 1)
          .otherwise(0))
      .withColumn("island", sum(col("newSpan")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("start")).cast("long").as("span_start"),
        (max(col("start")) + w).cast("long").as("span_end"),
        count(lit(1)).cast("long").as("n_dup_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_dup_windows"))
  }

  /** Remove duplicated substrings, keeping one canonical copy: for each
    * duplicated window key the smallest (doc_id, start) occurrence is
    * exempt (the paper's keep-one semantics, made deterministic); every
    * token covered by a NON-exempt duplicated window is dropped, and
    * the surviving tokens are re-joined with single spaces. A token the
    * canonical window shares with a non-canonical one is still dropped
    * — coverage is per-window, not per-token-vote. Output: (doc_id,
    * clean_text, n_removed_tokens), one row per input document
    * (documents with nothing to remove pass through verbatim modulo
    * whitespace normalization).
    *
    * Cost = the [[rankedDuplicatedWindows]] agg + join-back (canonical
    * pick rides the aggregation) + one `doc_id` shuffle for the
    * coverage merge + a broadcast-friendly spans join back to the
    * corpus.
    */
  def removeDuplicatedSpans(
      docs: DataFrame, minTokens: Int = 50,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    removeCovered(docs,
      rankedDuplicatedWindows(docs, minTokens, textCol, idCol)
        .filter(!col("kept")).select(col("doc_id"), col("start")),
      minTokens, textCol, idCol)

  /** Rebuild each document with the tokens covered by the `(doc_id,
    * start)` windows in `nonCanon` removed — the removal kernel of
    * [[removeDuplicatedSpans]], shared by the streaming variant (which
    * derives `nonCanon` from in-batch duplication plus cross-batch
    * key state instead of a global window rank).
    */
  private[graft] def removeCovered(
      docs: DataFrame, nonCanon: DataFrame, minTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = minTokens
    // Merge non-canonical coverage into spans, then collect the spans
    // of each document into one array row for the rebuild join.
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val spans = nonCanon
      .withColumn("newSpan",
        when(col("start") > lag(col("start"), 1).over(byDoc) + w, 1)
          .when(lag(col("start"), 1).over(byDoc).isNull, 1)
          .otherwise(0))
      .withColumn("island", sum(col("newSpan")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("start")).as("s"), (max(col("start")) + w).as("e"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .join(spans, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        concat_ws(" ", filter(col("t"), (_, i) =>
          coalesce(!exists(col("spans"), sp =>
            i >= sp("s") && i < sp("e")), lit(true)))).as("clean_text"),
        coalesce(
          aggregate(col("spans"), lit(0L), (acc, sp) =>
            acc + least(sp("e"), size(col("t"))) - sp("s")),
          lit(0L)).cast("long").as("n_removed_tokens"))
  }
}
