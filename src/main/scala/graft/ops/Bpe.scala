package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed vocabulary training and
  * corpus encoding (Sennrich, Haddow, Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * tokenization primitive of every LLM data pipeline.
  *
  * Scale shape (how production tokenizer trainers actually work): the
  * corpus collapses to a WORD-FREQUENCY table first — one map-side-
  * combined groupBy, the only pass over the data — and the merge loop
  * runs over that table, whose size is Heaps'-law bounded (capped at
  * `maxWords` by frequency, deterministic ties), not corpus-bounded.
  * Encoding is a broadcast-merges map over documents with a
  * per-partition word→tokens memo (words repeat; each distinct word is
  * BPE'd once per partition).
  *
  * Determinism: merge selection breaks frequency ties lexicographically,
  * the word cap breaks frequency ties lexicographically, and the merge
  * loop is sequential — identical corpora give identical vocabularies
  * on every run and partitioning.
  *
  * Word boundaries: tokens never merge across words; each word ends
  * with the `EndOfWord` sentinel so decode can reconstruct spacing
  * exactly (round-trip equality over normalized text is the
  * correctness contract, `q_bpe`).
  */
object Bpe {

  /** End-of-word sentinel appended to each word's last symbol. U+2581
    * (lower one-eighth block, the SentencePiece convention) — outside
    * the normalized-ASCII corpus alphabet.
    */
  val EndOfWord = "▁"

  /** A trained tokenizer: ranked merge list (training order = priority)
    * and the derived token vocabulary (single symbols + merge results,
    * ids in deterministic order).
    */
  final case class Model(merges: Vector[(String, String)], vocab: Vector[String]) {
    lazy val ranks: Map[(String, String), Int] = merges.iterator.zipWithIndex.toMap
    lazy val ids: Map[String, Int] = vocab.iterator.zipWithIndex.toMap
  }

  private def wordSymbols(w: String): Vector[String] = {
    val cs = w.toCharArray.map(_.toString)
    if (cs.isEmpty) Vector.empty
    else { cs(cs.length - 1) = cs(cs.length - 1) + EndOfWord; cs.toVector }
  }

  /** Word-frequency table: (word, freq), capped at `maxWords` rows by
    * (freq desc, word asc) — the one corpus pass of training.
    */
  def wordCounts(docs: DataFrame, maxWords: Int, textCol: String = "text"): Array[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(Dedup.normalizeText(col(textCol)), " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .orderBy($"f".desc, $"w")
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
  }

  /** Train a BPE vocabulary of ~`vocabSize` tokens (base symbols +
    * merges; the loop stops early when no pair repeats). Driver cost is
    * O(iterations * sum of word lengths) over the CAPPED word table —
    * corpus size never enters.
    */
  def train(docs: DataFrame, vocabSize: Int, maxWords: Int = 100000, textCol: String = "text"): Model = {
    require(vocabSize >= 1 && maxWords >= 1, s"vocabSize, maxWords >= 1: $vocabSize, $maxWords")
    val wc = wordCounts(docs, maxWords, textCol)
    var words: Array[(Vector[String], Long)] = wc.map { case (w, f) => (wordSymbols(w), f) }

    val base = words.iterator.flatMap(_._1).toSet.toVector.sorted
    val merges = Vector.newBuilder[(String, String)]
    var vocab = base
    var nMerges = math.max(0, vocabSize - base.length)
    while (nMerges > 0) {
      // Pair frequencies over the word table, weighted by word freq.
      val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), f) => (-f, a, b) }
        .headOption
      best match {
        case None => nMerges = 0 // nothing repeats: vocabulary is done
        case Some((p @ (a, b), _)) =>
          merges += p
          vocab = vocab :+ (a + b)
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                  out += (a + b); i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), f)
            }
          }
          nMerges -= 1
      }
    }
    Model(merges.result(), vocab)
  }

  /** BPE-encode one word under ranked merges (lowest rank first — the
    * standard greedy order, identical to training order).
    */
  private[graft] def encodeWord(w: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = wordSymbols(w)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++ syms.drop(bestAt + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** (doc_id, tokens array<string>, n_tokens): the encoded corpus. One
    * shuffle-free map; merges broadcast; per-partition word memo so
    * each distinct word is encoded once per partition.
    */
  def encode(docs: DataFrame, model: Model, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model.ranks)
    val f: String => Seq[String] = new (String => Seq[String]) with Serializable {
      @transient private lazy val memo =
        collection.mutable.HashMap.empty[String, Vector[String]]
      def apply(text: String): Seq[String] = {
        val words = Option(text).getOrElse("").trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty)
        words.iterator.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, bc.value))).toSeq
      }
    }
    val enc = udf(f)
    docs.select(col(idCol).as("doc_id"), enc(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Inverse of [[encode]]: concatenate tokens, turn each end-of-word
    * sentinel back into a single space. Exact round trip over
    * normalized text — BPE is a bijection on the word level.
    */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").replace(EndOfWord, " ").trim
}
