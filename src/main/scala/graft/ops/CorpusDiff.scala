package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** (id, change) for every id present in either snapshot;
    * `change ∈ {added, removed, changed, unchanged}`. Set
    * `includeUnchanged = false` (default) to emit only the delta.
    */
  def diff(
      prev: DataFrame, next: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text",
      includeUnchanged: Boolean = false): DataFrame = {
    val p = prev.select(col(idCol).cast("long").as("id"),
      xxhash64(col(contentCol)).as("ph"))
    val n = next.select(col(idCol).cast("long").as("id"),
      xxhash64(col(contentCol)).as("nh"))
    val j = p.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("ph").isNull, "added")
          .when(col("nh").isNull, "removed")
          .when(col("ph") === col("nh"), "unchanged")
          .otherwise("changed").as("change"))
    if (includeUnchanged) j else j.where(col("change") =!= "unchanged")
  }

  /** Per-class counts — the release-note line. One extra aggregation
    * over the diff, nothing collected beyond 4 rows. */
  def diffSummary(
      prev: DataFrame, next: DataFrame,
      idCol: String = "doc_id", contentCol: String = "text"): DataFrame =
    diff(prev, next, idCol, contentCol, includeUnchanged = true)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
}
