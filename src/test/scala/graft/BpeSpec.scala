package graft

import graft.ops.{Bpe, Dedup}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("train: hand-checked merges on a tiny corpus") {
    // "low low low lower" — most frequent pair is (l,o) freq 4, then
    // (lo,w▁) freq 3 (lower's w has no sentinel)...
    val tiny = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val m = Bpe.train(tiny, vocabSize = 100)
    assert(m.merges.head == ("l", "o"))
    assert(m.merges.contains(("lo", "w" + Bpe.EndOfWord)))
    // every merge result is in the vocab, after the base symbols
    m.merges.foreach { case (a, b) => assert(m.vocab.contains(a + b)) }
  }

  test("encodeWord: greedy lowest-rank order reproduces training segmentation") {
    val tiny = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val m = Bpe.train(tiny, vocabSize = 100)
    // Training fully merges the repeated words into single tokens.
    assert(Bpe.encodeWord("aaab", m.ranks).length == 1)
    // Unseen words segment into learned subwords + base symbols, never fail.
    val out = Bpe.encodeWord("aaabaaab", m.ranks)
    assert(out.nonEmpty && Bpe.decode(out) == "aaabaaab")
  }

  test("round trip: decode(encode(x)) == normalized x on the real corpus") {
    val m = Bpe.train(docs, vocabSize = 300, maxWords = 5000)
    val enc = Bpe.encode(docs, m)
    val got = enc.select($"doc_id", $"tokens").collect()
      .map(r => r.getLong(0) -> Bpe.decode(r.getSeq[String](1))).toMap
    val want = docs
      .select($"doc_id", Dedup.normalizeText($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  test("compression: trained vocab yields fewer tokens than characters") {
    val m = Bpe.train(docs, vocabSize = 300, maxWords = 5000)
    val enc = Bpe.encode(docs, m)
    val nTok = enc.agg(sum($"n_tokens")).as[Long].head()
    val nChr = docs.select(sum(length(Dedup.normalizeText($"text")))).as[Long].head()
    assert(nTok < nChr / 2, s"BPE barely compressed: $nTok tokens vs $nChr chars")
  }

  test("deterministic: same vocab under repartition, ids stable") {
    val a = Bpe.train(docs, vocabSize = 120, maxWords = 2000)
    val b = Bpe.train(docs.repartition(7), vocabSize = 120, maxWords = 2000)
    assert(a.merges == b.merges && a.vocab == b.vocab)
    assert(a.ids.size == a.vocab.size)
  }

  test("vocabSize smaller than the alphabet: zero merges, chars pass through") {
    val m = Bpe.train(docs.limit(50), vocabSize = 1)
    assert(m.merges.isEmpty)
    val toks = Bpe.encodeWord("cat", m.ranks)
    assert(toks == Vector("c", "a", "t" + Bpe.EndOfWord))
  }
}
