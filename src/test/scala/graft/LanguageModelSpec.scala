package graft

import graft.ops.LanguageModel
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def toDocs(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("vocabulary: counts, minCount cut, normalization") {
    val docs = toDocs(Seq(
      (1L, "the cat  sat"), (2L, "THE cat ran"), (3L, "a dog\tran")))
    val v = LanguageModel.vocabulary(docs, minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("the" -> 2L, "cat" -> 2L, "ran" -> 2L))
  }

  test("maxVocab cap: top-N by (cnt desc, token asc); cut tokens score OOV") {
    // counts: a->3, b->2, c->2, d->1. maxVocab=2 under minCount=1 keeps
    // a (3) and b (2, tie with c broken by token asc); c and d are cut.
    val docs = toDocs(Seq((1L, "a a a b"), (2L, "b c c d")))
    val v = LanguageModel.vocabulary(docs, minCount = 1, maxVocab = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("a" -> 3L, "b" -> 2L))
    // The LM is defined over the CAPPED table: total=5, V=2, denom=8.
    val s = LanguageModel.perplexityScores(docs, minCount = 1, maxVocab = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    def lp(cnt: Long): Long = math.round(math.log((cnt + 1) / 8.0) * 1e6)
    assert(s(2L).getLong(2) == 3L, "c, c, d must be OOV at the cap")
    assert(s(2L).getLong(3) == lp(2) + 3 * lp(0))
    // Raising the cap past the vocabulary is a no-op (cap-invariance).
    val uncapped = LanguageModel.perplexityScores(docs, minCount = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val bigCap = LanguageModel.perplexityScores(docs, minCount = 1, maxVocab = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(uncapped == bigCap)
  }

  test("scoreDocs rejects an oversized caller-provided vocab loudly") {
    val docs = toDocs(Seq((1L, "a b")))
    val big = spark.range(LanguageModel.DefaultMaxVocab + 1L)
      .selectExpr("cast(id as string) AS token", "1L AS cnt")
    val e = intercept[IllegalArgumentException] {
      LanguageModel.scoreDocs(docs, big).collect()
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("an explicit maxVocab above the default threads through to scoring") {
    // Regression: scoreDocs used to re-cap at DefaultMaxVocab, so any
    // caller asking for a LARGER vocabulary always threw. The cap must
    // follow the caller's maxVocab end-to-end.
    val docs = toDocs(Seq((1L, "a b c"), (2L, "a b")))
    val wide = LanguageModel.perplexityScores(
      docs, minCount = 1, maxVocab = LanguageModel.DefaultMaxVocab + 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val default = LanguageModel.perplexityScores(docs, minCount = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(wide == default, "tiny corpus is cap-invariant once the cap threads through")
    // And scoreDocs with a caller vocab sized between the default and
    // the explicit cap is accepted when that cap is passed.
    val v = LanguageModel.vocabulary(docs, minCount = 1,
      maxVocab = LanguageModel.DefaultMaxVocab + 10)
    LanguageModel.scoreDocs(docs, v,
      maxVocab = LanguageModel.DefaultMaxVocab + 10).collect()
  }

  test("scoreDocs: hand-computed Laplace unigram on a tiny corpus") {
    val docs = toDocs(Seq((1L, "a a b"), (2L, "a b c")))
    // vocab (minCount=1): a->3, b->2, c->1; total=6, V=3, denom=10.
    val s = LanguageModel.perplexityScores(docs, minCount = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    def lp(cnt: Long): Long = math.round(math.log((cnt + 1) / 10.0) * 1e6)
    assert(s(1L).getLong(1) == 3L && s(1L).getLong(2) == 0L)
    assert(s(1L).getLong(3) == 2 * lp(3) + lp(2))
    assert(s(2L).getLong(3) == lp(3) + lp(2) + lp(1))
    val ce = s(1L).getDouble(4)
    assert(math.abs(ce - (-(2 * lp(3) + lp(2)) / 3e6)) < 1e-12)
    assert(math.abs(s(1L).getDouble(5) - math.exp(ce)) < 1e-12)
  }

  test("OOV: tokens under minCount score as unseen") {
    val docs = toDocs(Seq((1L, "x x x rare"), (2L, "x x")))
    // minCount=2: vocab = {x->5}; "rare" is OOV.
    val s = LanguageModel.perplexityScores(docs, minCount = 2)
      .filter($"doc_id" === 1).head()
    assert(s.getLong(1) == 4L && s.getLong(2) == 1L)
    // OOV gets cnt=0 -> p = 1/(5+1+1).
    val expect = 3 * math.round(math.log(6.0 / 7.0) * 1e6) +
      math.round(math.log(1.0 / 7.0) * 1e6)
    assert(s.getLong(3) == expect)
  }

  test("empty / whitespace-only docs score zero, never crash") {
    val docs = toDocs(Seq((1L, ""), (2L, "   "), (3L, "ok ok")))
    val s = LanguageModel.perplexityScores(docs, minCount = 1)
    assert(s.count() == 3)
    val e = s.filter($"doc_id" === 1).head()
    assert(e.getLong(1) == 0L && e.getLong(3) == 0L && e.getDouble(4) == 0.0)
  }

  test("deterministic under repartition (integer micro-nat sums)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = LanguageModel.perplexityScores(docs, minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = LanguageModel.perplexityScores(docs.repartition(7), minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a == b)
  }

  test("filterByPerplexity: integer-exact band, gibberish scores worse") {
    val natural = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // Gibberish = unique tokens nowhere else in the corpus: all OOV,
    // maximum perplexity under the corpus LM.
    val gib = (9000001L to 9000020L)
      .map(i => (i, (0 until 30).map(j => s"zqx${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val all = natural.select($"doc_id", $"text").union(gib)
    val scores = LanguageModel.perplexityScores(all, minCount = 2)
    val gibCe = scores.filter($"doc_id" >= 9000000L).agg(min($"cross_entropy")).as[Double].head()
    val natCe = scores.filter($"doc_id" < 9000000L).agg(expr("percentile(cross_entropy, 0.95)")).as[Double].head()
    assert(gibCe > natCe, s"gibberish ($gibCe) should out-score natural p95 ($natCe)")
    // Band filter keeps exactly the docs whose ce lies in the band.
    val lo = 0.0; val hi = natCe
    val kept = LanguageModel.filterByPerplexity(all, lo, hi, minCount = 2)
      .select($"doc_id").as[Long].collect().toSet
    val expect = scores
      .filter($"n_tokens" > 0 &&
        -$"lp_micro" >= $"n_tokens" * (lo * 1e6) && -$"lp_micro" <= $"n_tokens" * (hi * 1e6))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == expect)
    assert(kept.forall(_ < 9000000L), "gibberish survived the band filter")
  }
}
