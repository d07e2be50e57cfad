package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation — the crawl-metadata stages every web corpus
  * runs BEFORE touching document text (C4 / RefinedWeb discipline):
  * parse, canonicalize, URL-dedup (the same page fetched twice), and
  * per-domain caps (no single site dominating the mixture). The
  * reference has no notion of sources or URLs; this exists for the
  * pipeline's users.
  *
  * Everything is codegen'd string expressions and one window per
  * keyed stage — no UDFs, no driver state. Canonicalization is a
  * deterministic, engine-portable rule set (each rule replayable in
  * any RE2-capable SQL engine — that is what makes the hard DuckDB
  * oracle `q_url_normalize` possible), NOT a full WHATWG parser:
  * crawl URLs are messy and a total parse is the wrong contract; a
  * canonical-form function must only be deterministic, idempotent,
  * and collapse the equivalences that matter for dedup.
  *
  * Rules applied by [[normalizeUrl]], in order:
  *   1. trim; strip the `#fragment`;
  *   2. lowercase scheme and host (path/query stay case-sensitive);
  *   3. strip explicit default ports (`:80` http, `:443` https);
  *   4. drop tracking query params (`utm_*`, `fbclid`, `gclid`,
  *      `msclkid`, `igshid`, `mc_eid`), sort the survivors, drop the
  *      `?` if none survive;
  *   5. strip ALL trailing slashes from the path (`/a//` == `/a`,
  *      `/` == empty). Deliberately broader than RFC 3986 equivalence
  *      (`/a/` and `/a` are distinct URLs): this is a DEDUP canonical
  *      form, and crawlers meet both spellings of the same page.
  */
object UrlCuration {

  /** Query params dropped by canonicalization (anchored match against
    * `name=`). */
  val TrackingParams = "utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid"

  /** Second-level labels under which a 2-letter ccTLD hosts
    * registrations (the pragmatic core of the public-suffix list —
    * deterministic and engine-portable, documented as an
    * approximation).
    */
  val SecondLevelLabels: Seq[String] = Seq("co", "com", "net", "org", "ac", "gov", "edu")

  private val schemeHostRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)"

  /** Lowercased scheme (empty when the value is not a URL). */
  def scheme(url: Column): Column = lower(regexp_extract(url, schemeHostRe, 1))

  /** Lowercased host with any `:port` and credentials removed. */
  def host(url: Column): Column = {
    val authority = lower(regexp_extract(url, schemeHostRe, 2))
    val noCreds = regexp_replace(authority, "^[^@]*@", "")
    regexp_replace(noCreds, ":[0-9]*$", "")
  }

  /** Path component (may be empty; excludes query and fragment). */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Query string without the leading `?` (empty when absent). */
  def query(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** The registered domain of a host: last two labels, or last three
    * when the second-to-last is a [[SecondLevelLabels]] entry under a
    * 2-letter ccTLD (`example.co.uk`). IPs and single-label hosts pass
    * through whole.
    */
  def registeredDomain(hostCol: Column): Column = {
    val ls = split(hostCol, "\\.")
    val n = size(ls)
    val isIp = hostCol.rlike("^[0-9.]+$")
    val sld = element_at(ls, -2)
    val tld = element_at(ls, -1)
    val three = concat_ws(".", element_at(ls, -3), sld, tld)
    val two = concat_ws(".", sld, tld)
    when(isIp || n <= 2, hostCol)
      .when(length(tld) === 2 && sld.isin(SecondLevelLabels: _*) && n >= 3, three)
      .otherwise(two)
  }

  // ------------------------------------------------- public suffix list

  /** Parsed public-suffix rules (publicsuffix.org semantics): plain
    * rules, `*.` wildcards, `!` exceptions — comments and blanks
    * skipped. The real list is ~10k rules, so it broadcasts as a set.
    */
  private[graft] final case class PslRules(
      exact: Set[String], wildcard: Set[String], exception: Set[String])

  private[graft] object PslRules {
    def parse(lines: Seq[String]): PslRules = {
      val clean = lines.iterator.map(_.trim.toLowerCase)
        .filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      PslRules(
        exact = clean.filterNot(l => l.startsWith("*.") || l.startsWith("!")).toSet,
        wildcard = clean.filter(_.startsWith("*.")).map(_.drop(2)).toSet,
        exception = clean.filter(_.startsWith("!")).map(_.drop(1)).toSet)
    }
  }

  /** Registered domain per the full PSL algorithm: longest matching
    * rule wins, `*.suffix` matches one extra label, `!rule` names the
    * registrable domain directly; the registered domain is the public
    * suffix plus one label. Hosts matching no rule fall back to the
    * built-in heuristic of [[registeredDomain]].
    */
  private[graft] def pslRegisteredDomain(host: String, r: PslRules): String = {
    if (host == null) return null
    val h = host.toLowerCase
    if (h.matches("^[0-9.]+$")) return h
    val labels = h.split('.')
    if (labels.isEmpty) return h
    var ps = -1 // label count of the longest matching public suffix
    var len = 1
    while (len <= labels.length) {
      val suffix = labels.takeRight(len).mkString(".")
      if (r.exception.contains(suffix)) return suffix
      if (r.exact.contains(suffix)) ps = len
      if (len >= 2 && r.wildcard.contains(labels.takeRight(len - 1).mkString(".")))
        ps = len
      len += 1
    }
    if (ps < 0) { // no rule: built-in heuristic, same shape as the Column form
      if (labels.length <= 2) h
      else {
        val tld = labels.last
        val sld = labels(labels.length - 2)
        if (tld.length == 2 && SecondLevelLabels.contains(sld)) labels.takeRight(3).mkString(".")
        else labels.takeRight(2).mkString(".")
      }
    }
    else if (ps >= labels.length) h // the host IS a public suffix
    else labels.takeRight(ps + 1).mkString(".")
  }

  /** [[registeredDomain]] with a user-supplied public-suffix list, so
    * multi-tenant hosts (`alice.github.io`, `bob.blogspot.com`) group
    * per tenant instead of per provider. The rules broadcast as a set
    * and resolve in a scalar lookup — a join against a ~10k-row rule
    * table would shuffle the corpus for what is a dimension lookup.
    */
  def registeredDomain(hostCol: Column, psl: Seq[String]): Column = {
    require(psl.nonEmpty, "empty public-suffix list; use registeredDomain(host) instead")
    val rules = PslRules.parse(psl)
    val f = udf((h: String) => pslRegisteredDomain(h, rules))
    f(hostCol)
  }

  /** Canonical URL form (rules in the object doc). Idempotent;
    * non-URL values normalize to themselves trimmed of fragment.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val sch = scheme(noFrag)
    val rawAuth = regexp_extract(noFrag, schemeHostRe, 2)
    val h0 = lower(regexp_replace(rawAuth, "^[^@]*@", ""))
    val h = when(sch === "http", regexp_replace(h0, ":80$", ""))
      .when(sch === "https", regexp_replace(h0, ":443$", ""))
      .otherwise(h0)
    val p0 = path(noFrag)
    val p = when(p0 === "/" || p0 === "", lit("")).otherwise(regexp_replace(p0, "/+$", ""))
    val q0 = query(noFrag)
    val kept = sort_array(filter(split(q0, "&"),
      x => x =!= "" && !x.rlike(s"^($TrackingParams)=")))
    val q = when(q0 === "" || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(sch === "", noFrag).otherwise(concat(sch, lit("://"), h, p, q))
  }

  /** Add (norm_url, domain) for `urlCol`. A non-empty `psl` switches
    * the domain to the full public-suffix algorithm.
    */
  def parse(df: DataFrame, urlCol: String = "url", psl: Seq[String] = Nil): DataFrame = {
    val n = normalizeUrl(col(urlCol))
    val dom = if (psl.isEmpty) registeredDomain(host(n)) else registeredDomain(host(n), psl)
    df.withColumn("norm_url", n).withColumn("domain", dom)
  }

  /** URL dedup: one row per canonical URL, keeping the minimum id —
    * the same page fetched twice (tracking params, fragment, default
    * port, trailing slash) collapses. One map-side-combinable shuffle
    * on the normalized URL.
    */
  def dedupByUrl(df: DataFrame, urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    // ONE min_by hash aggregation on the canonical URL: normalizeUrl
    // (ten-odd regexp passes per row) runs exactly once per row on the
    // map side, partial aggregation collapses a hot URL to one row per
    // map task before the exchange (a page fetched 10^6 times never
    // lands on a single task — the keep-min-rank window this replaces
    // put every occurrence into one un-splittable WindowExec sort),
    // and no join-back shuffle is needed.
    val cols = df.columns
    df.groupBy(normalizeUrl(col(urlCol)).as("__uc_key"))
      .agg(min_by(struct(cols.map(col).toIndexedSeq: _*), col(idCol)).as("__uc_row"))
      .select("__uc_row.*")
  }

  /** Per-domain cap: keep at most `k` documents per registered domain,
    * chosen DETERMINISTICALLY by the portable id hash (not arrival
    * order, which is layout-dependent) — the "no single site dominates
    * the corpus" rule.
    *
    * Skew shape: the keeper ids come from [[TopK.topKPerGroup]], whose
    * per-partition bounded heaps prune each input partition to at most
    * `k` candidates per domain BEFORE the domain shuffle — so a
    * billion-doc mega-domain contributes O(partitions * k) rows to the
    * final ranking instead of ranking a billion rows in one window
    * task. Survivors re-attach by a left-semi join on the unique id
    * (uniform — no hot key can exist on a unique column); the URL is
    * parsed only in the narrow pruning branch.
    */
  def capPerDomain(
      df: DataFrame, k: Int,
      urlCol: String = "url", idCol: String = "doc_id",
      psl: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val h = host(normalizeUrl(col(urlCol)))
    val dom = if (psl.isEmpty) registeredDomain(h) else registeredDomain(h, psl)
    // hashKey is < 2^32, so its negation is exact in a double and
    // "top-k by -hash desc, id asc" == "bottom-k by (hash, id) asc".
    // The id must cast to a numeric: a null cast (non-numeric string
    // id, or a null id) would otherwise silently drop the row at the
    // final semi-join — fail loudly instead.
    val idLong = col(idCol).cast("long")
    val checkedId = when(idLong.isNull, raise_error(concat(
      lit(s"capPerDomain requires a numeric, non-null $idCol; got: "),
      coalesce(col(idCol).cast("string"), lit("NULL"))))).otherwise(idLong)
    val keyed = df.select(
      checkedId.as("__uc_id"),
      dom.as("__uc_dom"),
      -Sampling.hashKey(idCol).cast("double"))
      .toDF("__uc_id", "__uc_dom", "__uc_negh")
    val keepIds = TopK.topKPerGroup(keyed, "__uc_dom", "__uc_id", "__uc_negh", k)
      .select(col("id").as("__uc_keep"))
    df.join(keepIds, col(idCol).cast("long") === col("__uc_keep"), "leftsemi")
  }
}
