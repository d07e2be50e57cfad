package graft

import graft.ops.UrlCuration
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup/caps: each rule pinned by a
  * hand case, the whole rule set idempotent, dedup collapsing exactly
  * the intended equivalences, and the per-domain cap deterministic
  * under repartitioning.
  */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(UrlCuration.normalizeUrl($"u")).as[String].head()

  private def dom(h: String): String =
    Seq(h).toDF("h").select(UrlCuration.registeredDomain($"h")).as[String].head()

  test("scheme/host lowercase; path and query case preserved") {
    assert(norm("HTTP://WWW.Example.COM/Path?Q=Val") == "http://www.example.com/Path?Q=Val")
  }

  test("fragment stripped; default ports stripped per scheme; other ports kept") {
    assert(norm("http://a.test/p#section") == "http://a.test/p")
    assert(norm("http://a.test:80/p") == "http://a.test/p")
    assert(norm("https://a.test:443/p") == "https://a.test/p")
    assert(norm("http://a.test:8080/p") == "http://a.test:8080/p")
    assert(norm("https://a.test:80/p") == "https://a.test:80/p") // 80 is not https's default
  }

  test("credentials removed from the authority") {
    assert(norm("http://user:pw@a.test/p") == "http://a.test/p")
  }

  test("tracking params dropped, survivors sorted, empty query collapses") {
    assert(norm("http://a.test/p?b=2&utm_source=x&a=1") == "http://a.test/p?a=1&b=2")
    assert(norm("http://a.test/p?gclid=abc") == "http://a.test/p")
    assert(norm("http://a.test/p?utm_campaign=1&fbclid=2&msclkid=3&igshid=4&mc_eid=5")
      == "http://a.test/p")
    // utmx is NOT a tracking prefix match (anchored utm_).
    assert(norm("http://a.test/p?utmx=1") == "http://a.test/p?utmx=1")
  }

  test("trailing slash collapses; root path collapses to empty") {
    assert(norm("http://a.test/p/") == "http://a.test/p")
    assert(norm("http://a.test/") == "http://a.test")
    assert(norm("http://a.test") == "http://a.test")
  }

  test("idempotent: normalize(normalize(u)) == normalize(u)") {
    val urls = Seq(
      "HTTP://U:P@WWW.Site.COM:80/A/B/?z=9&utm_source=s&a=1#f",
      "https://x.example.co.uk:443/",
      "not a url at all",
      "ftp://files.test:21/x")
    urls.foreach { u =>
      val once = norm(u)
      assert(norm(once) == once, s"not idempotent on $u -> $once")
    }
  }

  test("non-URL values pass through (trimmed of fragment) instead of erroring") {
    assert(norm("not a url at all") == "not a url at all")
  }

  test("registered domain: plain, ccTLD second-level, IP, single label") {
    assert(dom("www.blog.example.com") == "example.com")
    assert(dom("a.b.example.co.uk") == "example.co.uk")
    assert(dom("example.com") == "example.com")
    assert(dom("localhost") == "localhost")
    assert(dom("192.168.0.1") == "192.168.0.1")
    assert(dom("co.uk") == "co.uk") // bare suffix: nothing registered below it
  }

  test("dedupByUrl collapses tracking/fragment/port/slash variants, keeps min id") {
    val df = Seq(
      (10L, "http://a.test/p?utm_source=x"),
      (3L, "http://A.test:80/p/"),
      (7L, "http://a.test/p#frag"),
      (5L, "http://a.test/other")).toDF("doc_id", "url")
    val kept = UrlCuration.dedupByUrl(df).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 5L))
  }

  test("capPerDomain: at most k per domain, deterministic under repartition") {
    val df = (0L until 40L).map(i =>
      (i, s"http://sub$i.dom${i % 3}.example.com/p")).toDF("doc_id", "url")
    val a = UrlCuration.capPerDomain(df, k = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = UrlCuration.capPerDomain(df.repartition(7), k = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "cap membership must not depend on layout")
    assert(a.size == 4, "dom0..2 share registered domain example.com -> one group of 4")
    val c = UrlCuration.capPerDomain(
        df.withColumn("url",
          regexp_replace($"url", lit("example\\.com"), concat(lit("ex"), $"doc_id" % 3, lit(".com")))),
        k = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(c.size == 12, "three distinct registered domains, 4 each")
  }

  test("capPerDomain: mega-domain membership matches the direct bottom-k, heap-pruned") {
    // one domain holding every row — the skew case the per-partition
    // heap prune exists for: only O(partitions * k) rows may reach the
    // final ranking window. Membership must equal the global bottom-k
    // by (hashKey, id) exactly.
    val n = 50000
    val df = spark.range(n).select($"id".as("doc_id"),
      concat(lit("http://mega.example.com/p/"), $"id").as("url"))
    val kept = UrlCuration.capPerDomain(df, k = 7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val expected = df
      .select($"doc_id", graft.ops.Sampling.hashKey("doc_id").as("h"))
      .orderBy($"h", $"doc_id").limit(7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == expected)
    assert(kept.size == 7)
  }

  test("capPerDomain: non-numeric or null id fails fast instead of dropping rows") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // Malformed string id: the ANSI cast raises (CAST_INVALID_INPUT) —
    // loud, not a silent null that would drop the row at the semi-join.
    val bad = Seq(
      ("doc-a", "http://x.example.com/1"),
      ("doc-b", "http://x.example.com/2")).toDF("doc_id", "url")
    val e1 = intercept[Exception] { UrlCuration.capPerDomain(bad, k = 1).count() }
    assert(messages(e1).exists(m =>
      m.contains("CAST_INVALID_INPUT") || m.contains("capPerDomain requires a numeric")),
      s"expected a loud cast failure, got: ${messages(e1)}")
    // Null id: the cast passes (null), so the explicit guard must raise.
    val withNull = Seq(
      (java.lang.Long.valueOf(1L), "http://x.example.com/1"),
      (null.asInstanceOf[java.lang.Long], "http://x.example.com/2"))
      .toDF("doc_id", "url")
    val e2 = intercept[Exception] { UrlCuration.capPerDomain(withNull, k = 1).count() }
    assert(messages(e2).exists(_.contains("capPerDomain requires a numeric")),
      s"expected the fail-fast message, got: ${messages(e2)}")
  }

  test("parse adds norm_url and domain columns") {
    val out = UrlCuration.parse(
        Seq((1L, "HTTP://WWW.X.Example.ORG/a?utm_source=1")).toDF("doc_id", "url"))
      .select("norm_url", "domain").as[(String, String)].head()
    assert(out == ("http://www.x.example.org/a", "example.org"))
  }

  test("PSL rules: plain, wildcard, exception, longest-match, fallback") {
    val r = UrlCuration.PslRules.parse(Seq(
      "// comment", "", "com", "uk", "co.uk", "github.io",
      "*.ck", "!www.ck"))
    def d(h: String) = UrlCuration.pslRegisteredDomain(h, r)
    assert(d("alice.github.io") == "alice.github.io", "multi-tenant host groups per tenant")
    assert(d("deep.alice.github.io") == "alice.github.io")
    assert(d("example.co.uk") == "example.co.uk", "longest rule (co.uk) beats uk")
    assert(d("a.example.co.uk") == "example.co.uk")
    assert(d("example.com") == "example.com")
    assert(d("anything.wild.ck") == "anything.wild.ck", "*.ck makes wild.ck a public suffix")
    assert(d("www.ck") == "www.ck", "exception rule names the registrable domain")
    assert(d("sub.www.ck") == "www.ck")
    assert(d("github.io") == "github.io", "a bare public suffix passes through whole")
    assert(d("x.example.de") == "example.de", "no rule for de -> built-in heuristic")
    assert(d("x.example.co.jp") == "example.co.jp", "fallback keeps the ccTLD SLD rule")
    assert(d("127.0.0.1") == "127.0.0.1")
    assert(d(null) == null)
  }

  test("capPerDomain with a PSL caps multi-tenant hosts per tenant") {
    val psl = Seq("com", "io", "github.io")
    // 6 docs across 3 github.io tenants; without the PSL they all share
    // registered domain github.io and k=2 keeps only 2.
    val df = (0L until 6L).map(i =>
      (i, s"http://tenant${i % 3}.github.io/page$i")).toDF("doc_id", "url")
    val without = UrlCuration.capPerDomain(df, k = 2)
    assert(without.count() == 2)
    val withPsl = UrlCuration.capPerDomain(df, k = 2, psl = psl)
    assert(withPsl.count() == 6, "three tenants, 2 docs each, all under the cap")
    // parse() exposes the same switch.
    val doms = UrlCuration.parse(df, psl = psl)
      .select("domain").distinct().as[String].collect().sorted.toSeq
    assert(doms == Seq("tenant0.github.io", "tenant1.github.io", "tenant2.github.io"))
  }
}
