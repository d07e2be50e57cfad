package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Everything except langId/fingerprint stays in codegen'd built-ins so
  * the whole stage is one WholeStageCodegen span over the scan.
  */
object TextAnalysis {

  /** Whitespace token count. DuckDB-equivalent:
    * `len(regexp_split_to_array(trim(text), '\s+'))`.
    */
  def tokenCount(c: Column): Column = size(split(trim(c), "\\s+"))

  /** BPE-ish token count: word pieces + individual punctuation, the
    * usual pre-tokenizer regex. DuckDB:
    * `len(regexp_extract_all(text, '\w+|[^\w\s]'))`.
    */
  def wordPieceCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Count of sentence punctuation characters. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:]", ""))

  /** Common-English stopwords used by the quality heuristics. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that")

  /** Fraction of whitespace tokens that are stopwords, rounded to 4 dp. */
  def stopwordRatio(c: Column): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val stops = array(Stopwords.map(lit): _*)
    round(size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks), 4)
  }

  /** Mean whitespace-token length, rounded to 4 dp. */
  def meanTokenLength(c: Column): Column = {
    val toks = split(trim(c), "\\s+")
    round(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks), 4)
  }

  /** Per-document analysis table: one row per doc with the quality
    * signals. All columns but `quality` are DuckDB-expressible.
    */
  def analyze(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    // Counts cast to long: DuckDB's length()/len() are BIGINT and the
    // oracle compare is dtype-sensitive.
    docs.select(
      col(idCol).as("doc_id"),
      length(t).cast("long").as("n_chars"),
      tokenCount(t).cast("long").as("n_tokens"),
      wordPieceCount(t).cast("long").as("n_pieces"),
      punctCount(t).cast("long").as("n_punct"),
      stopwordRatio(t).as("stopword_ratio"),
      meanTokenLength(t).as("mean_token_len"))
  }

  /** Composite quality score in [0, 1]: length sweet-spot, readable
    * token lengths, some-but-not-too-many stopwords, low punctuation
    * noise. Heuristic (C4/Gopher-style rules re-expressed as a score).
    */
  def qualityScore(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val a = analyze(docs, textCol, idCol)
    val lenScore = least(col("n_tokens").cast("double") / 50.0, lit(1.0))
    val tokLenScore =
      when(col("mean_token_len").between(3.0, 10.0), 1.0).otherwise(0.5)
    val stopScore =
      when(col("stopword_ratio").between(0.01, 0.6), 1.0).otherwise(0.5)
    val punctScore = when(col("n_punct") * 10 <= col("n_chars"), 1.0).otherwise(0.5)
    a.withColumn("quality",
      round((lenScore + tokLenScore + stopScore + punctScore) / 4.0, 4))
  }

  // ----------------------------------------------------------- repetition

  /** Gopher-style repetition signals (Rae et al. 2021, the duplicate
    * n-gram filters): per document, the fraction of duplicate tokens,
    * bigrams, and trigrams. `dup_frac(xs) = (|xs| - |distinct xs|) /
    * max(|xs|, 1)` — 0 for fully novel text, → 1 for degenerate loops.
    * All builtin array ops (split/slice/zip_with/array_distinct): one
    * WholeStageCodegen pass over the scan, no shuffle, no UDF, O(doc
    * length) per row — safe at any corpus scale.
    */
  /** Array of space-joined k-gram shingles over an already-split token
    * array: the k shifted slices of length n-k+1, zipped. slice() with a
    * clamped non-negative length is empty-safe for docs shorter than k.
    * Pure builtins — stays inside WholeStageCodegen.
    */
  def tokenGrams(tokens: Column, k: Int): Column = {
    require(k >= 1, s"k-gram order must be >= 1: $k")
    val m = greatest(size(tokens) - (k - 1), lit(0))
    val shifted = (1 to k).map(i => slice(tokens, lit(i), m))
    shifted.reduceLeft((acc, s) => zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
  }

  /** Whitespace tokenization shared by the n-gram operators. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Unicode NFC normalization via the native codegen expression
    * ([[graft.functions.NfcNormalize]]) — precomposed and decomposed
    * renderings of the same text become one string, so every
    * downstream identity (dedup hashes, shingles, line keys, BPE
    * merges) sees one form. DuckDB-equivalent: `nfc_normalize(text)`.
    */
  def nfcCol(spark: org.apache.spark.sql.SparkSession, text: Column): Column = {
    graft.functions.GraftFunctions.registerNativeNfc(spark)
    call_function("graft_nfc", text)
  }

  /** The standard text-normalization stage: NFC, control characters
    * stripped (newlines/tabs survive — line structure is load-bearing
    * for [[LineDedup]]), space/tab runs collapsed, edges trimmed.
    * Pure codegen projection over the scan — no UDF, no shuffle.
    */
  def normalizeText(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn(textCol,
      trim(regexp_replace(
        regexp_replace(nfcCol(df.sparkSession, col(textCol)),
          "[\\p{Cc}&&[^\\n\\t]]", ""),
        "[ \\t]+", " ")))

  def repetitionSignals(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def dupFrac(arr: Column): Column =
      round((size(arr) - size(array_distinct(arr))).cast("double") /
        greatest(size(arr), lit(1)), 4)
    val t = tokens(col(textCol))
    docs
      .select(col(idCol).cast("long").as("doc_id"), t.as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        dupFrac(col("t")).as("dup_token_frac"),
        dupFrac(tokenGrams(col("t"), 2)).as("dup_bigram_frac"),
        dupFrac(tokenGrams(col("t"), 3)).as("dup_trigram_frac"))
  }

  // -------------------------------------------------------------- chunking

  /** Sliding-window text chunking: split each document into
    * `width`-token chunks every `stride` tokens (overlap = width −
    * stride) — the retrieval / embedding-prep step. Start positions are
    * 0, stride, 2·stride, …, ceil((n−width)/stride)·stride, so the last
    * chunk always reaches the final token and every token is covered.
    * Output: (doc_id, chunk_id, chunk_text, n_chunk_tokens), one row
    * per chunk. Pure builtins (sequence/transform/slice + posexplode):
    * codegen'd, shuffle-free, output rows ≈ input tokens / stride.
    */
  def chunk(
      docs: DataFrame, width: Int, stride: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width: width=$width stride=$stride")
    val t = tokens(col(textCol))
    docs
      .select(col(idCol).cast("long").as("doc_id"), t.as("t"), size(t).as("n"))
      .withColumn("n_chunks",
        when(col("n") <= width, lit(1))
          .otherwise(expr(s"(n - $width + $stride - 1) div $stride").cast("int") + 1))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_chunks") - 1),
          i => slice(col("t"), i * stride + 1, lit(width)))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_chunk_tokens"))
  }

  /** [[chunk]] keyed for the vector tier: adds a single collision-free
    * long key `chunk_key = doc_id * maxChunks + chunk_id` usable
    * directly as [[AnnIndex.build]]'s `vec_id` — and invertible
    * (`doc_id = chunk_key / maxChunks`, `chunk_id = chunk_key %
    * maxChunks`), so retrieval hits map back to documents WITHOUT a
    * join. Doc ids must be NON-NEGATIVE — the stated inversion uses
    * JVM truncate-toward-zero division, which un-inverts negative keys
    * (doc −1, chunk 5 keys to −999995, and −999995/1000000 = 0, not
    * −1) — so a negative id fails loudly here rather than round-trip
    * wrong later. Fails loudly too when a document chunks past
    * `maxChunks` or the key would overflow a long (every check stays
    * inside the `when` branch — under ANSI mode a bare overflow would
    * throw a generic ARITHMETIC_OVERFLOW before any separate check
    * column runs).
    */
  def keyedChunks(
      docs: DataFrame, width: Int, stride: Int,
      maxChunks: Long = 1000000L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxChunks >= 1, s"maxChunks must be >= 1: $maxChunks")
    val chunks = chunk(docs, width, stride, textCol, idCol)
    val key = when(
      col("doc_id") < 0 || col("chunk_id") >= maxChunks ||
        col("doc_id") > lit((Long.MaxValue - (maxChunks - 1)) / maxChunks),
      raise_error(concat(lit(s"chunk_key out of range (need 0 <= doc_id and " +
        s"chunk_id < maxChunks=$maxChunks, key <= Long.MaxValue) for doc "),
        col("doc_id").cast("string"))).cast("long"))
      .otherwise(col("doc_id") * maxChunks + col("chunk_id"))
    chunks.select(key.as("chunk_key"),
      col("doc_id"), col("chunk_id"), col("chunk_text"), col("n_chunk_tokens"))
  }

  // ------------------------------------------------------------ language id

  /** Tiny per-language stopword profiles (public common-word lists). */
  private val Profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "of", "and", "to", "in", "is", "that", "it", "was", "for", "with", "are", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "für", "auf", "ich"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas", "des", "je", "avec"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "para", "con", "no"))

  /** N-gram/stopword language-ID heuristic. CJK codepoint density decides
    * zh; otherwise the profile with the most stopword hits wins, falling
    * back to "en" when nothing matches (scores ties break alphabetically
    * for determinism).
    */
  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().filter(cp =>
      (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)).count()
    if (cjk * 5 >= text.length) return "zh"
    // Locale.ROOT: predictions must not depend on the JVM's default
    // locale (tr_TR toLowerCase would unmap 'I' out of every profile).
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}]+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    val scores = Profiles.view.mapValues(p => toks.count(p.contains)).toMap
    val (best, hits) = scores.toSeq.sortBy { case (l, h) => (-h, l) }.head
    if (hits == 0) "en" else best
  }

  /** (doc_id, pred_lang) per document. */
  def languageId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lid = udf((t: String) => detectLanguage(t))
    docs.select(col(idCol).as("doc_id"), lid(col(textCol)).as("pred_lang"))
  }

  // ---------------------------------------------------------- fingerprint

  // ------------------------------------------------------------- PII

  /** Dialect-portable PII patterns (valid and equivalent in Java regex
    * and RE2, so an external engine can recompute matches): emails and
    * http(s) URLs. Phone patterns are deliberately excluded — there is
    * no dialect-stable definition worth standardizing on.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"

  /** Per-document PII scan: (doc_id, n_emails, n_urls). All-builtin
    * (regexp_extract_all + size), codegen'd, one pass over the scan.
    */
  def piiScan(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0))).cast("long").as("n_urls"))

  /** Redact emails/URLs in place — the scrub half of PII handling.
    * Output schema == input schema with the text column rewritten.
    */
  def scrubPii(
      docs: DataFrame,
      textCol: String = "text",
      emailToken: String = "<EMAIL>",
      urlToken: String = "<URL>"): DataFrame = {
    // Replacement strings are regex-replacement syntax ('$', '\') —
    // quote them so caller tokens are always literal.
    val et = java.util.regex.Matcher.quoteReplacement(emailToken)
    val ut = java.util.regex.Matcher.quoteReplacement(urlToken)
    docs.withColumn(textCol,
      regexp_replace(
        regexp_replace(col(textCol), EmailPattern, et),
        UrlPattern, ut))
  }

  /** Order-sensitive rolling document fingerprint: polynomial rolling
    * hash over whitespace tokens (Rabin–Karp style) — equal texts hash
    * equal, any reordering or edit changes it.
    */
  def fingerprint(text: String): Long = {
    var h = 1125899906842597L // large prime seed
    text.trim.split("\\s+").foreach { tok =>
      h = h * 31L + (MurmurHash3.stringHash(tok).toLong & 0xFFFFFFFFL)
    }
    h
  }

  /** (doc_id, fp) per document. */
  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fp = udf((t: String) => fingerprint(t))
    docs.select(col(idCol).as("doc_id"), fp(col(textCol)).as("fp"))
  }
}
