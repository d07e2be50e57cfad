package graft

import graft.ops.{Curation, HtmlExtract}
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction: markup stripped, payload tags dropped
  * whole, block structure preserved as lines, entities decoded once,
  * boilerplate-short lines removed — and the stage is a pure projection
  * (no shuffle, no UDF) that slots ahead of the curation row filters.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def ex(html: String, minWords: Int = 1): String =
    Seq(html).toDF("h").select(HtmlExtract.extractText($"h", minWords)).as[String].head()

  test("tags stripped, block tags become line breaks") {
    val got = ex("<html><body><h1>Title Here</h1><p>first para text</p>" +
      "<p>second para text</p></body></html>")
    assert(got == "Title Here\nfirst para text\nsecond para text")
  }

  test("script/style/noscript payloads are dropped whole, case-insensitive") {
    val got = ex("<p>keep this</p><SCRIPT type=\"text/javascript\">var x = \"<p>lie</p>\";" +
      "</SCRIPT><style>p { color: red }</style><noscript>enable js</noscript><p>and this</p>")
    assert(got == "keep this\nand this")
    assert(!got.contains("lie") && !got.contains("color") && !got.contains("enable"))
  }

  test("comments removed, including multiline and markup inside") {
    val got = ex("<p>a b</p><!-- hidden\n<p>ghost</p>\n--><p>c d</p>")
    assert(got == "a b\nc d")
  }

  test("entities decode once: &amp;lt; is literal &lt;, not <") {
    val got = ex("<p>x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp;lt;</p>")
    assert(got == "x & y <tag> \"q\" 's' a b &lt;")
  }

  test("inline tags become spaces without gluing words; whitespace collapses") {
    val got = ex("<p>one<b>two</b>three   \t four</p>")
    assert(got == "one two three four")
  }

  test("boilerplate-line rule: lines under minWords words are dropped") {
    val html = "<ul><li>Home</li><li>About Us</li></ul><p>real sentence with five words</p>" +
      "<div class=\"footer\">Copyright</div>"
    assert(ex(html, minWords = 3) == "real sentence with five words")
    // minWords=1 keeps every non-empty line.
    assert(ex(html, minWords = 1) == "Home\nAbout Us\nreal sentence with five words\nCopyright")
  }

  test("unclosed payload tag degrades gracefully (drops to end, no error)") {
    assert(ex("<p>before</p><script>var broken = 1;") == "before\nvar broken = 1;" ||
      ex("<p>before</p><script>var broken = 1;") == "before")
  }

  test("plain text without markup passes through modulo whitespace") {
    assert(ex("just words here") == "just words here")
    assert(ex("  spaced   out  ") == "spaced out")
  }

  test("null html yields null text via extract()") {
    val df = Seq((1L, "<p>a b</p>"), (2L, null)).toDF("doc_id", "text")
    val out = HtmlExtract.extract(df, htmlCol = "text").orderBy("doc_id")
      .select("text").as[String].collect()
    assert(out(0) == "a b" && out(1) == null)
  }

  test("stage is a pure projection: no shuffle in the plan") {
    val df = Seq((1L, "<p>a</p>")).toDF("doc_id", "text")
    val plan = HtmlExtract.extract(df, htmlCol = "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"HTML extract must not shuffle:\n$plan")
  }

  test("curation rowStages applies extraction first when configured") {
    val docs = Seq(
      (1L, "<html><body><p>the quick brown fox jumps over the lazy dog today fine</p>" +
        "<script>garbage();</script></body></html>", "web"),
      (2L, "<div><ul><li>Nav</li></ul></div>", "web")) // boilerplate only -> empty text
      .toDF("doc_id", "text", "source")
    val cfg = Curation.Config(htmlExtractMinWords = Some(3), langs = Set("en"))
    val out = Curation.rowStages(docs, cfg).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.get(1L).exists(t => t.contains("quick brown fox") && !t.contains("garbage")))
    assert(!out.contains(2L) || out(2L) == "")
  }
}
