package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact line-level deduplication: flag (and optionally remove) every
  * LINE whose trimmed content occurs at least `minCount` times across
  * the corpus — the duplicated-line cleanup of C4 (Raffel et al.,
  * JMLR'20 §2.2) and RefinedWeb (Penedo et al., NeurIPS'23), which
  * strips boilerplate ("all rights reserved", cookie banners,
  * navigation stubs) that repeats across crawled pages without ever
  * comparing documents pairwise. The reference engine's dedup surface
  * is document-level (`/root/reference/README.md`); line granularity
  * sits between it and the token-span granularity of
  * [[SubstringDedup]], and shares its keep-one discipline.
  *
  * Semantics:
  *   - a line's identity is its TRIMMED content; blank lines are never
  *     duplicates (they would otherwise all match each other and
  *     paragraph structure would collapse);
  *   - a line is duplicated when its corpus-wide occurrence count
  *     (counting repeats inside one document) reaches `minCount`;
  *   - keep-one: the occurrence with the smallest (doc_id, line_idx)
  *     keeps its line, every other occurrence is removed — so exactly
  *     one copy of each boilerplate line survives corpus-wide, the
  *     [[SubstringDedup]] rule at line granularity.
  *
  * Scale shape: lines are exploded with codegen builtins (no shuffle),
  * counted with ONE map-side-combinable hash shuffle on an 8-byte
  * `xxhash64` key, and joined back hash-partitioned on that same key
  * against the tiny filtered duplicate side — never a self-join, so
  * the candidate explosion of pairwise designs cannot occur. The
  * rebuild is one `doc_id` shuffle. Everything is linear in total
  * lines; nothing reaches the driver. As in [[SubstringDedup]], the
  * 64-bit hash is the scale path and the oracle groups on raw content,
  * so agreement doubles as a collision check.
  */
object LineDedup {

  /** One row per line: (doc_id, line_idx, raw, norm, h). `line_idx` is
    * the 0-based position; `norm` is the trimmed content; `h` is
    * `xxhash64(norm)`. `split(_, "\n", -1)` keeps trailing empties, so
    * indices are stable under rebuild. Pure builtins, no shuffle.
    */
  def lines(
      docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      sep: String = "\n"): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep), -1)).as(Seq("line_idx", "raw")))
      .withColumn("norm", trim(col("raw")))
      .withColumn("h", xxhash64(col("norm")))

  /** Paragraph-granularity twin of [[lines]]: split on the LITERAL
    * blank-line separator "\n\n" (quoted, so rebuild via
    * `concat_ws(sep)` round-trips byte-identically — a regex split
    * would collapse separator runs and corrupt untouched documents).
    * Feed to the `*From` variants with `sep = "\n\n"` rebuilds
    * downstream.
    */
  def paragraphs(
      docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    lines(docs, textCol, idCol, sep = "\n\n")

  /** Every occurrence of a duplicated line: (doc_id, line_idx, cnt,
    * kept). `cnt` is the corpus-wide occurrence count of the line's
    * trimmed content; `kept` marks the single smallest (doc_id,
    * line_idx) occurrence that keep-one removal preserves.
    */
  def duplicatedLines(
      docs: DataFrame, minCount: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    duplicatedLinesFrom(
      lines(docs, textCol, idCol).localCheckpoint(), minCount)

  /** As [[duplicatedLines]], from an already-built [[lines]] frame —
    * callers running BOTH the flag and removal passes should build the
    * line frame once (and at 100 TB persist/localCheckpoint it, the
    * `SubstringDedup` sharing discipline) instead of re-exploding the
    * corpus per pass.
    */
  def duplicatedLinesFrom(l: DataFrame, minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2: $minCount")
    // Skew-immune shape: count/min(struct) per line hash via a
    // map-side-combinable hash aggregation (a boilerplate line in 10^9
    // documents collapses to one row per map task before the
    // exchange), then join the duplicated keys back onto the
    // occurrences. The join probe IS hot on that key, but it is a
    // shuffle join AQE skew-splitting can divide across tasks —
    // unlike the `Window.partitionBy(h)` this replaces, which
    // serialized every occurrence of the hottest line onto ONE
    // un-splittable WindowExec sort. The second evaluation of `l` is a
    // cache read under the `*From` discipline (callers persist or
    // localCheckpoint the exploded frame — see [[lines]]).
    val occ = l.where(col("norm") =!= "")
      .select(col("h"), col("doc_id"), col("line_idx"))
    val agg = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("line_idx"))).as("keeper"))
      .where(col("cnt") >= minCount)
    occ.join(agg, Seq("h"))
      .select(col("doc_id"), col("line_idx"), col("cnt"),
        (col("keeper.doc_id") === col("doc_id") &&
          col("keeper.line_idx") === col("line_idx")).as("kept"))
  }

  /** Keep-one removal: the corpus with every non-keeper occurrence of
    * a duplicated line deleted, remaining lines rejoined in original
    * order. Documents are never dropped — one that was ALL boilerplate
    * comes back as the empty string (callers filter on length, the
    * curation discipline), and untouched documents round-trip
    * byte-identically.
    */
  def removeDuplicatedLines(
      docs: DataFrame, minCount: Int = 2,
      textCol: String = "text", idCol: String = "doc_id",
      sep: String = "\n"): DataFrame =
    removeDuplicatedLinesFrom(
      lines(docs, textCol, idCol, sep).localCheckpoint(),
      docs.select(col(idCol).cast("long").as("doc_id")), minCount, sep)

  /** Paragraph-granularity keep-one removal — [[removeDuplicatedLines]]
    * over the literal "\n\n" separator. */
  def removeDuplicatedParagraphs(
      docs: DataFrame, minCount: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    removeDuplicatedLines(docs, minCount, textCol, idCol, sep = "\n\n")

  /** As [[removeDuplicatedLines]], from an already-built (ideally
    * persisted) [[lines]] frame plus the id set to preserve — ONE
    * explode feeds both the flag pass and the rebuild.
    */
  def removeDuplicatedLinesFrom(
      l: DataFrame, docIds: DataFrame, minCount: Int = 2,
      sep: String = "\n"): DataFrame =
    rebuildWithout(l, docIds,
      duplicatedLinesFrom(l, minCount)
        .where(!col("kept"))
        .select(col("doc_id"), col("line_idx")), sep)

  /** Rebuild (doc_id, clean_text) from a [[lines]] frame minus the
    * given (doc_id, line_idx) drop set — the shared kernel of the
    * batch removal and [[graft.streaming.StreamingLineDedup]]'s
    * cross-batch removal. */
  def rebuildWithout(
      l: DataFrame, docIds: DataFrame, drop: DataFrame,
      sep: String = "\n"): DataFrame = {
    val rebuilt = l
      .join(drop.withColumn("dropped", lit(true)),
        Seq("doc_id", "line_idx"), "left")
      .where(col("dropped").isNull)
      .groupBy(col("doc_id"))
      .agg(concat_ws(sep,
        transform(sort_array(collect_list(struct(col("line_idx"), col("raw")))),
          x => x("raw"))).as("clean_text"))
    docIds
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
