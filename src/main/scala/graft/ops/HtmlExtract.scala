package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text boilerplate extraction: the crawl-ingestion step that
  * precedes every C4/RefinedWeb-style curation run (strip markup, drop
  * script/style payloads, keep block structure as line breaks, then
  * discard boilerplate-short lines). The reference has no ingestion at
  * all (`/root/reference/core/stream.go:104` — `Append` is the only
  * entry), so this stage exists for the pipeline's real users, not for
  * reference parity.
  *
  * Everything is a chain of codegen'd string expressions
  * (`regexp_replace` / `transform` / `filter` / `array_join`) — one
  * projection, no UDF, no shuffle: at 100 TB this folds into the scan
  * that reads the crawl, exactly like the other row-local stages
  * ([[Curation.rowStages]]).
  *
  * Deliberately regular-grammar (tags matched by regex, not a DOM
  * parse): malformed crawl HTML breaks DOM parsers constantly, while
  * the regex pass degrades gracefully — an unclosed `<script>` drops
  * text to the next close tag instead of erroring the task. The same
  * passes are expressible in any engine's RE2/PCRE `regexp_replace`,
  * which is what makes the hard DuckDB oracle (`q_html_extract`)
  * possible. RE2 compatibility is a design constraint: no
  * backreferences (script/style/noscript are three separate passes,
  * not one `</\1>` pattern), flags inline via `(?is)`.
  */
object HtmlExtract {

  /** Tags whose whole CONTENT is dropped (payload, not prose). One
    * pass per tag — RE2 (the oracle engine) has no backreferences.
    */
  private val dropContentTags = Seq("script", "style", "noscript")

  /** Tags that terminate a text block: both their open and close forms
    * become line breaks, so `<p>a</p><p>b</p>` reads as two lines and
    * list/table cells don't concatenate into one word.
    */
  private val blockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|blockquote|" +
      "pre|section|article|aside|nav|header|footer|title|form|hr"

  /** The minimal named-entity map every crawl needs; unknown entities
    * pass through verbatim (they are content to a later filter, not an
    * error). `&amp;` decodes LAST so `&amp;lt;` yields the literal
    * `&lt;` rather than double-decoding to `<`.
    */
  private val entities = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** Markup removal only — comments, dropped-content tags, block tags
    * to newlines, remaining tags to spaces, entity decode. No line
    * normalization; [[extractText]] adds it.
    */
  def stripMarkup(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noPayload = dropContentTags.foldLeft(noComments)((c, t) =>
      regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", ""))
    val blocksAsLines =
      regexp_replace(noPayload, s"(?is)</?(?:$blockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocksAsLines, "(?s)<[^>]*>", " ")
    entities.foldLeft(noTags)((c, e) => regexp_replace(c, e._1, e._2))
  }

  /** Full extraction: [[stripMarkup]], then per-line whitespace
    * collapse + trim, then drop lines shorter than `minWordsPerLine`
    * words (the C4 boilerplate-line rule; 1 = drop only empties).
    * Lines rejoin with `\n`.
    */
  def extractText(html: Column, minWordsPerLine: Int = 1): Column = {
    require(minWordsPerLine >= 1, s"minWordsPerLine must be >= 1: $minWordsPerLine")
    val lines = split(stripMarkup(html), "\n")
    val norm = transform(lines, l => trim(regexp_replace(l, "[ \\t\\r]+", " ")))
    val kept = filter(norm,
      l => l =!= "" && size(split(l, " ")) >= lit(minWordsPerLine))
    array_join(kept, "\n")
  }

  /** DataFrame form: replace/add `outCol` with the extracted text of
    * `htmlCol`. Null HTML yields null text (flag upstream, don't
    * invent empty documents).
    */
  def extract(
      df: DataFrame,
      htmlCol: String = "html",
      outCol: String = "text",
      minWordsPerLine: Int = 1): DataFrame =
    df.withColumn(outCol,
      when(col(htmlCol).isNull, lit(null).cast("string"))
        .otherwise(extractText(col(htmlCol), minWordsPerLine)))
}
