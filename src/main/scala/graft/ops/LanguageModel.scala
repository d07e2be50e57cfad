package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the
  * perplexity-filter primitive of CCNet-style curation (Wenzek et al.,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", LREC 2020): train a LM on the corpus (there, KenLM 5-gram;
  * here, a Laplace-smoothed unigram over the corpus itself), score every
  * document by average negative log-likelihood, and filter the
  * high-perplexity tail.
  *
  * Scale shape: vocabulary = one token-count groupBy with map-side
  * combine, cut at `minCount` and HARD-CAPPED at `maxVocab` rows by
  * (freq desc, token asc) — the same top-N discipline as
  * [[Bpe.wordCounts]], compiling to TakeOrderedAndProject. A frequency
  * threshold alone is Heaps'-law bounded in expectation but unbounded
  * in the adversarial case (a 100 TB crawl holds 10^8-10^9 distinct
  * tokens even above minCount); the cap makes the driver collect and
  * the executor broadcast O(maxVocab) by construction. Scoring = one
  * map over documents with the capped vocab broadcast. No shuffle
  * touches the documents themselves.
  *
  * Engine portability (what makes `q_perplexity` a HARD oracle): the
  * per-token log-probability is quantized to integer micro-nats —
  * `round(ln(p) * 1e6)` as a long — and summed as integers, so the
  * per-document score is associativity-independent and reproducible
  * bit-for-bit by any engine whose `ln` is faithful to ~1e-10 (a rounded
  * SUM of doubles would depend on the summation order — the one FP trap
  * the verify harness documents). The float cross-entropy/perplexity
  * columns are derived from the integer form, never re-summed.
  */
object LanguageModel {

  /** Tokens of a document: the [[Dedup.normalizeText]] convention
    * (lowercase, whitespace-split) — identical to the shingle/token
    * kernel used across the text operators, and to DuckDB's
    * `string_split_regex(lower(trim(text)), '\s+')`.
    */
  private def tokensCol(textCol: String) =
    split(Dedup.normalizeText(col(textCol)), " ")

  /** Default vocabulary cap: 2^20 tokens ≈ tens of MB collected and
    * broadcast — comfortably driver/executor-safe, far above any test
    * or sf0.1 vocabulary (so results there are cap-invariant).
    */
  val DefaultMaxVocab: Int = 1 << 20

  /** (token, cnt) vocabulary: corpus token counts cut at `minCount`
    * (a frequency threshold is tie-free and engine-portable, unlike a
    * top-K cut whose boundary ties need careful ordering), then capped
    * at the top `maxVocab` rows by (cnt desc, token asc) — the
    * deterministic tie-break [[Bpe.wordCounts]] uses. Tokens cut by
    * either bound score as OOV downstream; the LM is defined OVER the
    * capped vocabulary (its total/V are the capped table's), so the
    * model stays self-consistent at any cap.
    */
  def vocabulary(
      docs: DataFrame,
      minCount: Long = 2L,
      textCol: String = "text",
      maxVocab: Int = DefaultMaxVocab): DataFrame = {
    require(maxVocab >= 1, s"maxVocab must be >= 1: $maxVocab")
    docs
      .select(explode(tokensCol(textCol)).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token"))
      .limit(maxVocab)
  }

  /** Score documents against a Laplace-smoothed unigram LM trained on
    * `vocab`: p(tok) = (cnt(tok) + 1) / (total + V + 1), OOV cnt = 0.
    *
    * Output per document:
    *   - `n_tokens`, `n_oov` — integer-exact observables;
    *   - `lp_micro` — sum over tokens of round(ln p * 1e6) as a long
    *     (the portable score: integer addition is order-independent);
    *   - `cross_entropy` — -lp_micro / (1e6 * n_tokens), nats/token;
    *   - `perplexity` — exp(cross_entropy).
    */
  def scoreDocs(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxVocab: Int = DefaultMaxVocab): DataFrame = {
    require(maxVocab >= 1, s"maxVocab must be >= 1: $maxVocab")
    val spark = docs.sparkSession
    import spark.implicits._
    // Bounded collect: [[vocabulary]] caps its output, but `vocab` is
    // caller-provided — limit BEFORE the collect so an uncapped frame
    // fails loudly after O(maxVocab) rows, never after 10^9. The cap
    // is the CALLER's maxVocab, so a vocabulary built with an explicit
    // larger cap scores with that same cap rather than tripping here.
    val rows = vocab.select(col("token"), col("cnt").cast("long"))
      .limit(maxVocab + 1).as[(String, Long)].collect()
    require(rows.length <= maxVocab,
      s"vocab exceeds $maxVocab rows; cap it (LanguageModel.vocabulary(maxVocab = ...))")
    val total = rows.iterator.map(_._2).sum
    val v = rows.length.toLong
    val bc = spark.sparkContext.broadcast(rows.toMap)
    val denom = (total + v + 1).toDouble

    val score = udf { (toks: Seq[String]) =>
      val m = bc.value
      var n = 0L; var oov = 0L; var lp = 0L
      toks.foreach { t =>
        if (t.nonEmpty) {
          n += 1
          val cnt = m.getOrElse(t, 0L)
          if (cnt == 0L) oov += 1
          lp += math.round(math.log((cnt + 1).toDouble / denom) * 1e6)
        }
      }
      (n, oov, lp)
    }
    docs
      .select(col(idCol).as("doc_id"), score(tokensCol(textCol)).as("s"))
      .select(col("doc_id"), col("s._1").as("n_tokens"), col("s._2").as("n_oov"),
        col("s._3").as("lp_micro"))
      .withColumn("cross_entropy",
        when(col("n_tokens") > 0,
          -col("lp_micro").cast("double") / (col("n_tokens").cast("double") * 1e6))
          .otherwise(0.0))
      .withColumn("perplexity", exp(col("cross_entropy")))
  }

  /** Train-and-score in one call (the common case: the corpus is its
    * own LM, as in within-corpus outlier filtering).
    */
  def perplexityScores(
      docs: DataFrame,
      minCount: Long = 2L,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxVocab: Int = DefaultMaxVocab): DataFrame =
    scoreDocs(docs, vocabulary(docs, minCount, textCol, maxVocab), idCol, textCol, maxVocab)

  /** Documents whose perplexity falls within [lo, hi] — the CCNet-style
    * band filter (too low = boilerplate/repetition, too high =
    * gibberish). Bounds are applied to the portable integer score
    * (lp_micro vs nats*1e6*n_tokens), so the survivor set is
    * engine-exact for any bounds.
    */
  def filterByPerplexity(
      docs: DataFrame,
      loNats: Double,
      hiNats: Double,
      minCount: Long = 2L,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxVocab: Int = DefaultMaxVocab): DataFrame = {
    require(loNats <= hiNats, s"loNats <= hiNats: $loNats, $hiNats")
    val scores = perplexityScores(docs, minCount, idCol, textCol, maxVocab)
      .filter(col("n_tokens") > 0)
      // -lp_micro in [lo*1e6*n, hi*1e6*n] — integer-exact band.
      .filter(-col("lp_micro") >= col("n_tokens") * (loNats * 1e6) &&
        -col("lp_micro") <= col("n_tokens") * (hiNats * 1e6))
      .select(col("doc_id").as("__keep_id"))
    docs.join(scores, docs(idCol) === col("__keep_id")).drop("__keep_id")
  }
}
