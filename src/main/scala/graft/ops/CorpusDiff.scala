package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions — the bookkeeping every
  * versioned training-data release needs ("what changed between
  * crawl-2026-07 and crawl-2026-08?") and the input to incremental
  * reprocessing (only `added` + `changed` docs re-enter the pipeline;
  * `removed` ids propagate as tombstones). The reference engine
  * versions its summary store by swap (`core/SummaryDB.writeAtomic`
  * mirrors it); this is the corpus-level counterpart.
  *
  * Diff identity is (id, xxhash64(content)): content equality by
  * 64-bit hash, the [[LineDedup]]/[[SubstringDedup]] scale discipline
  * — 8-byte comparisons instead of shipping document bodies through
  * the join. The result classes:
  *
  *   - `added`     — id in `next` only
  *   - `removed`   — id in `prev` only
  *   - `changed`   — id in both, content hash differs
  *   - `unchanged` — id in both, content hash equal
  *
  * Scale shape: ONE full-outer join on the id (both sides pre-projected
  * to (id, hash) — constant row width regardless of document size), no
  * driver state. At 100 TB the join is the unavoidable cost of a diff;
  * everything else is projection. Emitting `unchanged` is optional —
  * it is the dominant class in a healthy release and most callers only
  * want the delta.
  */
object CorpusDiff {

  /** The diff join key: `idCol` as a long, FAILING LOUDLY on null or
    * non-integral ids ([[Sampling.hashKeyOf]]'s discipline). A silent
    * cast-to-null here is worse than elsewhere: null keys never match
    * in the full-outer join, so every doc present in BOTH snapshots
    * would be misreported as added+removed — corruption, not an error.
    */
  private def idAsLong(idCol: String): Column = {
    val asLong = col(idCol).cast("long")
    when(asLong.isNotNull, asLong)
      .otherwise(raise_error(concat(
        lit(s"CorpusDiff: null or non-integral $idCol: "),
        coalesce(col(idCol).cast("string"), lit("null")))))
  }

  /** (id, change) for every id present in either snapshot;
    * `change ∈ {added, removed, changed, unchanged}`. Set
    * `includeUnchanged = false` (default) to emit only the delta.
    */
  def diff(
      prev: DataFrame, next: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text",
      includeUnchanged: Boolean = false): DataFrame = {
    val p = prev.select(idAsLong(idCol).as("id"),
      xxhash64(col(contentCol)).as("ph"))
    val n = next.select(idAsLong(idCol).as("id"),
      xxhash64(col(contentCol)).as("nh"))
    val j = p.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("ph").isNull, "added")
          .when(col("nh").isNull, "removed")
          .when(col("ph") === col("nh"), "unchanged")
          .otherwise("changed").as("change"))
    if (includeUnchanged) j else j.where(col("change") =!= "unchanged")
  }

  /** The incremental-reprocessing split: (docs to re-process, ids to
    * tombstone). Only `added`/`changed` documents re-enter a stateless
    * pipeline stage; `unchanged` results carry over from the previous
    * run and `removed` ids propagate as deletions — with per-row
    * stages (filters, scrubs, scoring) the carried-over + reprocessed
    * union is IDENTICAL to a full recompute (`CorpusDiffSpec` proves
    * it against [[Curation.rowStages]]), at the cost of the delta
    * instead of the corpus.
    */
  def incrementalTargets(
      prev: DataFrame, next: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text"): (DataFrame, DataFrame) = {
    val d = diff(prev, next, idCol, contentCol)
    // Reserved-name alias (leakageFreeSplit's __lf_id discipline): a
    // bare "id" would be ambiguous — and then dropped — if the caller's
    // idCol is itself literally "id".
    val targets = d.where(col("change").isin("added", "changed"))
      .select(col("id").as("__cd_id"))
    val reprocess = next.join(targets, next(idCol).cast("long") === col("__cd_id"))
      .drop("__cd_id")
    val tombstones = d.where(col("change") === "removed").select(col("id"))
    (reprocess, tombstones)
  }

  /** Per-class counts — the release-note line. One extra aggregation
    * over the diff, nothing collected beyond 4 rows. */
  def diffSummary(
      prev: DataFrame, next: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text"): DataFrame =
    diff(prev, next, idCol, contentCol, includeUnchanged = true)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
}
