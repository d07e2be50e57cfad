package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 lexical index — the retrieval twin of [[AnnIndex]],
  * completing the serving tier's symmetry: vector search probes a
  * persisted IVF tree, lexical search probes a persisted inverted
  * layout, and [[Bm25.rrf]] fuses the two without recomputing either
  * corpus pass.
  *
  * [[Bm25.topDocs]] re-tokenizes and re-aggregates the WHOLE corpus on
  * every call — the right shape for one-shot jobs, a 100-TB scan per
  * query batch in serving. This operator persists the corpus-pass
  * outputs once and answers each batch against them:
  *
  * {{{
  *   dir/lex/meta/               (n_tb)                          1 row
  *   dir/lex/postings/tb=<b>/    (term, doc_id, tf, dl, meta...) corpus
  *   dir/lex/dfd/tb=<b>/         (term, df, max_tf, min_dl)      df deltas
  *   dir/lex/stats/              (n_docs, sum_dl, n_terms)       stat deltas
  *   dir/tombstones/             (doc_id)                        takedowns
  * }}}
  *
  * `max_tf`/`min_dl` are the dfd's per-term IMPACT BOUNDS (summed-df
  * deltas combine by max/min, so they stay exact through append and
  * merge): the BM25 contribution is increasing in tf and decreasing in
  * dl for any valid (k1, b), so `contrib(max_tf, min_dl)` upper-bounds
  * every posting of the term at ANY probe-time parameters — the
  * MaxScore bound [[topDocs]]'s dynamic pruning uses to skip common
  * terms' postings without moving a single rank (Turtle & Flood 1995).
  *
  * Postings are TERM-SORTED within every data file (build, append,
  * compact, streaming all sort before writing) — the Spark-native form
  * of impact-ordered posting lists: row groups carry tight term
  * min/max stats and dictionary pages, so the probe's pushed
  * `term IN (...)` filter skips every row group holding no query term
  * and scan IO tracks the query terms' posting runs, not the bucket.
  * (Set `spark.sql.parquet.pushdown.inFilterThreshold` at or above the
  * probe's distinct-term count — else parquet degrades the In to a
  * min/max range and keeps only the weaker skip.)
  *
  * `meta...` are [[build]]'s caller-declared filterable attributes
  * (language, licence, source): [[topDocs]] accepts a predicate over
  * them that pushes into the pruned scan — filtered lexical search
  * with zero probe-path joins, the [[AnnIndex]] layout trade.
  *
  * The Spark-native part is the LAYOUT: postings are partitioned by a
  * term hash bucket (`tb = pmod(hash(term), n_tb)`), so a probe batch
  * collects its query terms' bucket ids (bounded by the query term
  * count) and pushes them as a static partition filter — the scan reads
  * only the directories that can contain a query term, the inverted-
  * file trade [[AnnIndex.topK]] makes with its `cell=` pruning. Doc
  * length is DENORMALIZED into the postings rows (Lucene's norms-with-
  * postings trade: 8 bytes/posting buys zero probe-path joins against a
  * corpus-sized doc-length table), so a probe is: pruned postings scan
  * ⨝ broadcast(query terms) ⨝ broadcast(query-term idf) → one
  * candidate-sized aggregation. Nothing index-sized ever shuffles.
  *
  * Unlike the ANN tier (frozen centers ⇒ recall drift until rebuild),
  * EVERY stored quantity here is an additive aggregate — tf and dl are
  * per-doc, df and (n_docs, sum_dl) are sums — so [[append]] is EXACT:
  * an index built on A then appended with B answers bit-identically to
  * one built on A ∪ B, and both replay [[Bm25.topDocs]] on the union
  * corpus (the shared [[Bm25.idfMicro]]/[[Bm25.contribMicro]] integer
  * micro-point expression trees make that a hash-equality, not a
  * tolerance). k1/b are PROBE-time parameters — the index stores raw
  * tf/dl/df, so retuning costs nothing.
  *
  * [[delete]] follows the serving tier's takedown contract: tombstoned
  * docs drop out of every probe immediately (candidate-bounded
  * anti-join); their contribution to df/avgdl/N persists until
  * [[compact]] physically retires them and recomputes the aggregates —
  * exactly a web index's behavior between takedown and segment merge.
  *
  * Mutators hold the single-writer lock; probes never lock — rebuilds
  * stage under `_build_tmp` and swap in with one atomic rename
  * ([[AnnIndex.build]]'s generation contract).
  */
object Bm25Index {

  private[graft] def lexPath(dir: String): String = s"$dir/lex"
  private[graft] def postingsPath(dir: String): String = s"$dir/lex/postings"
  private[graft] def dfdPath(dir: String): String = s"$dir/lex/dfd"
  private[graft] def statsPath(dir: String): String = s"$dir/lex/stats"
  private[graft] def metaPath(dir: String): String = s"$dir/lex/meta"

  private def fsFor(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def checkIndex(spark: SparkSession, dir: String): Unit =
    if (!fsFor(spark, dir).exists(new org.apache.hadoop.fs.Path(lexPath(dir))))
      throw new IllegalStateException(
        s"no BM25 index at $dir (missing lex/) — run Bm25Index.build first")

  private[graft] def withWriterLock[T](spark: SparkSession, dir: String)(body: => T): T = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.WriterLock.withLock(
      fs, graft.sources.WriterLock.lockPath(dir), s"Bm25Index $dir")(body)
  }

  private[graft] def readNTb(spark: SparkSession, dir: String): Int = {
    import spark.implicits._
    spark.read.parquet(metaPath(dir)).select($"n_tb").as[Int].head()
  }

  /** The term-bucket partition key — MUST be identical at build,
    * append and probe time (`n_tb` is frozen in `meta/` at build).
    */
  private[graft] def tbOf(term: Column, nTb: Int): Column = pmod(hash(term), lit(nTb))

  /** (term, doc_id, tf, dl, meta...) of a document batch — the shared
    * tokenize + aggregate pass of [[build]] and [[append]], dl (and the
    * caller-declared filterable metadata columns) DENORMALIZED onto
    * every posting: the filtered-search layout trade [[AnnIndex]] makes
    * — attribute bytes duplicated per posting buy a [[topDocs]] filter
    * that applies during the pruned scan with zero probe-path joins.
    * One corpus-sized shuffle (the map-side-combined groupBy),
    * identical tokenization to [[Bm25.scores]].
    */
  private[graft] def postingsOf(
      docs: DataFrame, textCol: String, idCol: String,
      metaCols: Seq[String] = Nil): DataFrame = {
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // dl from the tf table (it already holds every (doc, term, count))
    // — no second corpus pass; dl is per-doc, so batch-local dl equals
    // union-corpus dl, the root of [[append]]'s exactness.
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // Metadata rides the SAME per-doc join dl already pays — no extra
    // shuffle of posting-sized data.
    val docSide =
      if (metaCols.isEmpty) dl
      else dl.join(
        docs.select(col(idCol).cast("long").as("doc_id") +: metaCols.map(col): _*),
        "doc_id")
    tf.join(docSide, "doc_id")
      .select(Seq(col("term"), col("doc_id"), col("tf"), col("dl")) ++
        metaCols.map(col): _*)
  }

  /** The filterable metadata columns this index stores beside the
    * postings — everything in `postings/` that is not the term, the
    * ids/counters or the partition column (footer-only schema read).
    */
  private[graft] def indexMetaCols(spark: SparkSession, dir: String): Seq[String] = {
    val core = Set("term", "doc_id", "tf", "dl", "tb")
    spark.read.parquet(postingsPath(dir)).schema.fieldNames.toSeq.filterNot(core)
  }

  private[graft] def requireMeta(batch: DataFrame, meta: Seq[String], dir: String): Unit = {
    val missing = meta.filterNot(batch.columns.toSet)
    require(missing.isEmpty,
      s"batch is missing the index's metadata column(s) ${missing.mkString(", ")} " +
        s"(the BM25 index at $dir stores them beside every posting)")
  }

  /** Build the index at `dir` over `docs`, replacing any previous
    * generation with one atomic swap (probes mid-rebuild serve the old
    * complete index). Tombstones are generation state and clear with
    * the rebuild. Returns the indexed doc count.
    *
    * Refuses an EMPTY corpus (zero docs — under the shared tokenizer
    * every doc yields at least one token, so zero postings means zero
    * docs): `partitionBy` over an empty frame writes zero part
    * files, so the postings table would have no parquet footer and
    * every later probe/append would die on schema inference — loud
    * here beats cryptic there. Refuses too to REBUILD a live index
    * with a different `nTb`: probes read `n_tb` from `meta/` and scan
    * `postings/` as separate non-atomic reads, so a probe racing a
    * bucket-function change would compute bucket ids with the old
    * `n_tb` over the new layout and silently return incomplete
    * candidates. Resizing requires retiring the index (delete the
    * directory) first — that makes the race loud (missing `lex/`)
    * instead of silent.
    */
  def build(
      docs: DataFrame,
      dir: String,
      nTb: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id",
      metaCols: Seq[String] = Nil): Long = {
    val spark = docs.sparkSession
    require(nTb > 0, s"nTb > 0: $nTb")
    val reserved = Set("term", "doc_id", "tf", "dl", "tb")
    require(metaCols.forall(c => !reserved(c) && c != idCol && c != textCol),
      s"metaCols collide with index columns: ${metaCols.mkString(", ")}")
    withWriterLock(spark, dir) {
      import spark.implicits._
      val fs = fsFor(spark, dir)
      if (fs.exists(new org.apache.hadoop.fs.Path(metaPath(dir)))) {
        val existing = readNTb(spark, dir)
        require(existing == nTb,
          s"rebuilding the live BM25 index at $dir with nTb=$nTb != its nTb=$existing " +
            "would change the bucket function under concurrent probes (a probe that read " +
            "the old n_tb would scan the new layout's wrong buckets and silently miss " +
            "candidates); delete the index directory first to resize")
      }
      val staging = new org.apache.hadoop.fs.Path(s"$dir/_build_tmp")
      fs.delete(staging, true)
      // postings feed three writes (postings, dfd, stats) — pin one
      // evaluation or the corpus tokenize+shuffle replays per branch.
      val posts = postingsOf(docs, textCol, idCol, metaCols)
        .withColumn("tb", tbOf(col("term"), nTb))
        .localCheckpoint()
      require(!posts.isEmpty,
        s"refusing to build an empty BM25 index at $dir (no docs, or no doc tokenizes " +
          "to any term): an empty partitioned postings table has no parquet footer and " +
          "every later probe/append would fail on schema inference")
      // Salt caps the layout at <= 8 files per term bucket while still
      // writing a hot bucket with 8-way parallelism (the AnnIndex.build
      // discipline). Term-sorted within each file (the Spark-native
      // impact ordering): parquet row groups get tight term min/max
      // stats and dictionary pages, so the probe's pushed `term IN`
      // filter skips every row group holding no query term — IO
      // bounded by the query terms' postings, not the bucket.
      posts
        .repartition(col("tb"), pmod(hash(col("doc_id")), lit(8)))
        .sortWithinPartitions("tb", "term")
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$dir/_build_tmp/lex/postings")
      posts.groupBy("term").agg(count(lit(1)).as("df"),
        max("tf").as("max_tf"), min("dl").as("min_dl"))
        .withColumn("tb", tbOf(col("term"), nTb))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$dir/_build_tmp/lex/dfd")
      // vocabulary = the staged dfd's row count (one row per term) —
      // a parquet footer count, no data scan
      val vocab = spark.read.parquet(s"$dir/_build_tmp/lex/dfd").count()
      val nDocs = writeStatsDelta(spark, posts, s"$dir/_build_tmp/lex/stats", "overwrite",
        nTerms = vocab)
      Seq(nTb).toDF("n_tb").repartition(1)
        .write.mode("overwrite").parquet(s"$dir/_build_tmp/lex/meta")
      graft.sources.SwapHooks.preSwap(dir)
      graft.sources.BucketedLayout.swapDir(fs,
        new org.apache.hadoop.fs.Path(s"$dir/_build_tmp/lex"),
        new org.apache.hadoop.fs.Path(lexPath(dir)),
        new org.apache.hadoop.fs.Path(s"$dir/_build_old"))
      // Generation state: a rebuild starts with every given doc live,
      // and a fresh stream restarts batchIds at 0 — stale markers would
      // silently skip its first batches.
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/tombstones"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_stream_commits"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_stream_staging"), true)
      fs.delete(staging, true)
      nDocs
    }
  }

  /** One (n_docs, sum_dl, n_terms) stats delta from a postings frame.
    * Returns the doc count. `sum_dl` sums each doc's length ONCE (dl
    * rides on every posting row, so the per-doc row set is distinct'd
    * first — (doc_id, dl) is functionally dependent, the distinct is
    * exact). `nTerms` is the caller's NEW-to-the-index term count —
    * whole vocab at build/compact, the anti-joined novelty count at
    * append/merge/stream — so the vocabulary, though not itself
    * additive (batches share terms), stays EXACTLY recoverable as a
    * delta sum and [[stats]] never scans a data table for it.
    */
  private[graft] def writeStatsDelta(
      spark: SparkSession, posts: DataFrame, path: String, mode: String,
      nTerms: Long): Long = {
    import spark.implicits._
    // coalesce: sum over an EMPTY frame is null (an empty streaming
    // micro-batch must write a (0, 0, 0) delta, not NPE).
    val row = posts.select($"doc_id", $"dl").distinct()
      .agg(count(lit(1)).as("n_docs"), coalesce(sum($"dl"), lit(0L)).as("sum_dl"))
      .as[(Long, Long)].head()
    Seq((row._1, row._2, nTerms)).toDF("n_docs", "sum_dl", "n_terms").repartition(1)
      .write.mode(mode).parquet(path)
    row._1
  }

  /** Count of `batchTerms` (a distinct single-column `term` frame) NOT
    * already present in the index's dfd — the vocabulary-novelty delta
    * [[writeStatsDelta]] records for append/merge/stream. The dfd scan
    * prunes to the batch terms' buckets (bounded by nTb) and the
    * anti-join output is batch-vocab-sized; nothing corpus-shaped
    * moves. MUST run BEFORE the batch's own dfd rows land (the anti
    * would otherwise see the batch itself and count zero) — except for
    * a REDELIVERED streamed batch, whose earlier attempt may already
    * have installed its dfd file under the deterministic
    * `b<batchId>.parquet` name: `excludeBatch` masks exactly that file
    * out of the read, so the recount matches what the crashed attempt
    * computed and the deterministic-name stats replace stays exact.
    */
  private[graft] def newTermCount(
      spark: SparkSession, dir: String, batchTerms: DataFrame, nTb: Int,
      excludeBatch: Option[Long] = None): Long = {
    import spark.implicits._
    val tbs = batchTerms.select(tbOf(col("term"), nTb).as("tb"))
      .distinct().as[Int].collect().sorted
    val scan = spark.read.parquet(dfdPath(dir))
      .filter(col("tb").isin(tbs.map(Integer.valueOf).toIndexedSeq: _*))
    val existing = excludeBatch
      .fold(scan)(id => scan.filter(!input_file_name().endsWith(s"b$id.parquet")))
      .select("term")
    batchTerms.join(existing, Seq("term"), "left_anti").count()
  }

  /** Loud shape check for mutators appending stats deltas: an index
    * whose stats table predates the vocab-delta column must be rebuilt
    * (compact would also rewrite it) — silently appending 3-column
    * deltas beside 2-column ones corrupts every later stats read.
    */
  private[graft] def requireStatsHasTerms(spark: SparkSession, dir: String): Unit =
    require(spark.read.parquet(statsPath(dir)).columns.contains("n_terms"),
      s"the BM25 index at $dir was built before vocabulary deltas were tracked " +
        "(stats/ lacks n_terms) — rebuild or compact it before appending")

  /** Append a document batch — EXACT, not drift-accruing: every stored
    * quantity is additive (per-doc tf/dl rows, per-term df counts, the
    * (n_docs, sum_dl) pair), so after this call the index answers
    * bit-identically to one built from scratch on the union corpus.
    * Doc ids must be new to the index ([[AnnIndex.append]]'s contract;
    * re-appending an id would double-count its df). Each table's append
    * is job-atomic but the three-table composite is not — a crash
    * between them leaves the batch partially weighted until re-run
    * (the [[AnnIndex.append]] batch semantics; drivers that need a
    * crash-exact install use [[graft.streaming.StreamingBm25Ingest]],
    * whose staged deterministic-name protocol replaces rather than
    * duplicates). Returns the batch doc count.
    */
  def append(
      spark: SparkSession,
      dir: String,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): Long = withWriterLock(spark, dir) {
    checkIndex(spark, dir)
    requireStatsHasTerms(spark, dir)
    val nTb = readNTb(spark, dir)
    val meta = indexMetaCols(spark, dir)
    requireMeta(docs, meta, dir)
    val posts = postingsOf(docs, textCol, idCol, meta)
      .withColumn("tb", tbOf(col("term"), nTb))
      .localCheckpoint() // three writes, one evaluation
    // vocabulary novelty BEFORE the batch's dfd rows land
    val newTerms = newTermCount(spark, dir, posts.select("term").distinct(), nTb)
    posts.repartition(col("tb")).sortWithinPartitions("tb", "term")
      .write.mode("append").partitionBy("tb").parquet(postingsPath(dir))
    posts.groupBy("term").agg(count(lit(1)).as("df"),
        max("tf").as("max_tf"), min("dl").as("min_dl"))
      .withColumn("tb", tbOf(col("term"), nTb))
      .repartition(col("tb"))
      .write.mode("append").partitionBy("tb").parquet(dfdPath(dir))
    writeStatsDelta(spark, posts, statsPath(dir), "append", nTerms = newTerms)
  }

  /** Tombstone indexed docs — the takedown path. A tombstoned doc is
    * never returned by [[topDocs]] from the moment this returns; its
    * postings (and its weight in df/avgdl/N — scores of OTHER docs
    * drift by that much) are physically retired at the next [[compact]].
    * Ids not present in the index are ignored and ids already
    * tombstoned count once ([[AnnIndex.delete]]'s semantics). Returns
    * the count of distinct ids newly tombstoned.
    */
  def delete(
      spark: SparkSession,
      dir: String,
      ids: DataFrame,
      idCol: String = "doc_id"): Long = withWriterLock(spark, dir) {
    checkIndex(spark, dir)
    val requested = ids.select(col(idCol).cast("long").as("doc_id")).distinct()
      .localCheckpoint()
    val reqSide =
      if (requested.count() * 56L <= Similarity.BroadcastGuardBytes) broadcast(requested)
      else requested
    // One column-pruned semi scan of the postings' doc_id column; the
    // distinct is takedown-bounded (post-semi).
    val present = spark.read.parquet(postingsPath(dir)).select("doc_id")
      .join(reqSide, Seq("doc_id"), "left_semi")
      .distinct()
    val doomed = readTombstones(spark, dir)
      .fold(present)(t =>
        present.join(Similarity.guardedRowBroadcast(t), Seq("doc_id"), "left_anti"))
      .localCheckpoint()
    val n = doomed.count()
    if (n > 0)
      doomed.write.mode("append").parquet(s"$dir/tombstones")
    n
  }

  private def readTombstones(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString).select("doc_id").distinct())
  }

  /** Physically retire tombstoned docs and re-collapse the delta
    * tables: ONE job per table (postings minus tombstones, df and
    * stats recomputed exactly from the surviving postings), each staged
    * and swapped under the `lex/` root in one atomic rename — after
    * this, scores equal a fresh [[build]] on the surviving corpus.
    * Also the small-file play: thousands of appended batches collapse
    * back to <= 8 files per term bucket. Refuses to compact an index
    * down to ZERO live docs (every doc tombstoned) — the rewrite would
    * install a postings table with no parquet footer and every later
    * read would die on schema inference; retire the index (delete the
    * directory) instead. Returns the surviving doc count.
    */
  def compact(spark: SparkSession, dir: String): Long = withWriterLock(spark, dir) {
    checkIndex(spark, dir)
    val fs = fsFor(spark, dir)
    val nTb = readNTb(spark, dir)
    import spark.implicits._
    // Refuse to compact over an UNCOMMITTED streamed batch (a
    // `b<id>.parquet` whose marker is absent — a crashed attempt
    // pending redelivery): the rewrite would merge its rows into the
    // fresh generation AND destroy the deterministic name the retry
    // replaces, so the redelivery would install a second copy. Loud +
    // retryable, the [[AnnIndex.compact]] contract.
    val batchFile = "b(\\d+)\\.parquet".r
    val tableFiles: Seq[org.apache.hadoop.fs.FileStatus] =
      Seq(postingsPath(dir), dfdPath(dir))
        .map(new org.apache.hadoop.fs.Path(_))
        .flatMap(root => fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("tb="))
          .flatMap(td => fs.listStatus(td.getPath).toSeq)) ++
        fs.listStatus(new org.apache.hadoop.fs.Path(statsPath(dir))).toSeq
    val pending = tableFiles
      .flatMap(st => batchFile.findFirstMatchIn(st.getPath.getName).map(_.group(1)))
      .distinct
      .filterNot(id => fs.exists(
        new org.apache.hadoop.fs.Path(s"$dir/_stream_commits/$id")))
    if (pending.nonEmpty)
      throw new IllegalStateException(
        s"compact: uncommitted streamed batch(es) ${pending.mkString(", ")} present " +
          "— a crashed ingest attempt is pending redelivery; let the stream recover, then compact")
    val staging = new org.apache.hadoop.fs.Path(s"$dir/_compact_tmp")
    fs.delete(staging, true)
    val tomb = readTombstones(spark, dir)
    val live = tomb.fold(spark.read.parquet(postingsPath(dir)))(t =>
      spark.read.parquet(postingsPath(dir))
        .join(Similarity.guardedRowBroadcast(t), Seq("doc_id"), "left_anti"))
      .localCheckpoint()
    if (live.isEmpty)
      throw new IllegalStateException(
        s"refusing to compact the BM25 index at $dir down to zero live docs (every doc " +
          "is tombstoned): the rewrite would install a postings table with no parquet " +
          "footer; delete the index directory instead")
    live.repartition(col("tb"), pmod(hash(col("doc_id")), lit(8)))
      .sortWithinPartitions("tb", "term")
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$dir/_compact_tmp/lex/postings")
    live.groupBy("term").agg(count(lit(1)).as("df"),
        max("tf").as("max_tf"), min("dl").as("min_dl"))
      .withColumn("tb", tbOf(col("term"), nTb))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$dir/_compact_tmp/lex/dfd")
    // fresh-generation vocabulary from the staged dfd's footer count —
    // this is also where a tombstoned-out term leaves the count
    val vocab = spark.read.parquet(s"$dir/_compact_tmp/lex/dfd").count()
    val nDocs = writeStatsDelta(spark, live, s"$dir/_compact_tmp/lex/stats", "overwrite",
      nTerms = vocab)
    Seq(nTb).toDF("n_tb").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/_compact_tmp/lex/meta")
    graft.sources.SwapHooks.preSwap(dir)
    graft.sources.BucketedLayout.swapDir(fs,
      new org.apache.hadoop.fs.Path(s"$dir/_compact_tmp/lex"),
      new org.apache.hadoop.fs.Path(lexPath(dir)),
      new org.apache.hadoop.fs.Path(s"$dir/_compact_old"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/tombstones"), true)
    fs.delete(staging, true)
    nDocs
  }

  /** Merge another BM25 index INTO this one — shard consolidation
    * (per-crawl lexical indexes folded into the serving one). Because
    * everything is additive, the merge is EXACT like [[append]]: the
    * other index's live postings enter as one batch, df and stats
    * deltas recomputed from those surviving rows (the other's own
    * tombstones are honored; its pending stat drift does NOT transfer).
    * Doc ids must be disjoint from this index's. `other` is read-only.
    * Returns the number of docs merged in.
    */
  def merge(spark: SparkSession, dir: String, otherDir: String): Long =
    withWriterLock(spark, dir) {
      checkIndex(spark, dir)
      checkIndex(spark, otherDir)
      requireStatsHasTerms(spark, dir)
      val nTb = readNTb(spark, dir)
      val meta = indexMetaCols(spark, dir)
      val otherPosts = spark.read.parquet(postingsPath(otherDir))
      requireMeta(otherPosts, meta, dir)
      val live = readTombstones(spark, otherDir)
        .fold(otherPosts)(t =>
          otherPosts.join(Similarity.guardedRowBroadcast(t), Seq("doc_id"), "left_anti"))
        .select(Seq(col("term"), col("doc_id"), col("tf"), col("dl")) ++
          meta.map(col): _*)
        .withColumn("tb", tbOf(col("term"), nTb)) // THIS index's bucketing
        .localCheckpoint()
      // vocabulary novelty (the other's LIVE terms not already here)
      // BEFORE its dfd rows land
      val newTerms = newTermCount(spark, dir, live.select("term").distinct(), nTb)
      live.repartition(col("tb")).sortWithinPartitions("tb", "term")
        .write.mode("append").partitionBy("tb").parquet(postingsPath(dir))
      live.groupBy("term").agg(count(lit(1)).as("df"),
        max("tf").as("max_tf"), min("dl").as("min_dl"))
        .withColumn("tb", tbOf(col("term"), nTb))
        .repartition(col("tb"))
        .write.mode("append").partitionBy("tb").parquet(dfdPath(dir))
      writeStatsDelta(spark, live, statsPath(dir), "append", nTerms = newTerms)
    }

  /** Operational snapshot: live docs, distinct terms (vocabulary),
    * postings data files (the [[compact]] trigger — each appended
    * batch adds up to n_tb files), stat deltas pending collapse, and
    * tombstones pending physical retirement.
    *
    * METADATA-ONLY by construction: docs and terms are delta sums from
    * the tiny `stats/` table ([[writeStatsDelta]] records each
    * mutation's vocabulary NOVELTY, so the non-additive "distinct
    * terms" is still an exact additive sum), file counts are listings,
    * tombstones a takedown-sized count — no postings or dfd data scan
    * at any corpus size. Like `docs` vs pending takedowns' df drift,
    * `terms` counts a term whose docs are all tombstoned until
    * [[compact]] physically retires it.
    */
  final case class IndexStats(
      docs: Long,
      terms: Long,
      dataFiles: Long,
      statDeltas: Long,
      tombstones: Long)

  def stats(spark: SparkSession, dir: String): IndexStats = {
    checkIndex(spark, dir)
    val fs = fsFor(spark, dir)
    val root = new org.apache.hadoop.fs.Path(postingsPath(dir))
    val files = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("tb="))
      .map(td => fs.listStatus(td.getPath).count { st =>
        st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")
      }.toLong).sum
    import spark.implicits._
    val stat = spark.read.parquet(statsPath(dir))
    val (nDocs, nTerms) = stat
      .agg(coalesce(sum($"n_docs"), lit(0L)), coalesce(sum($"n_terms"), lit(0L)))
      .as[(Long, Long)].head()
    IndexStats(
      docs = nDocs - readTombstones(spark, dir).fold(0L)(_.count()),
      terms = nTerms,
      dataFiles = files,
      statDeltas = stat.count(),
      tombstones = readTombstones(spark, dir).fold(0L)(_.count()))
  }

  /** The `k` best docs per query against the persisted index:
    * (query_id, doc_id, rank, score_micro) — bit-identical to
    * [[Bm25.topDocs]] over the indexed corpus (same tokenization, same
    * shared integer micro-point expression trees, same bounded-heap
    * ranking). k1/b are free probe-time knobs: the index stores raw
    * tf/dl/df.
    *
    * Probe shape: the query terms' bucket ids (bounded by the distinct
    * query-term count) collect to a static partition filter, so the
    * postings and dfd scans read ONLY buckets that can hold a query
    * term; the query-term frame and the query-term-sized idf table
    * broadcast (guarded — past the guard the join falls back to a
    * shuffle of the pruned candidate stream); the one aggregation is
    * candidate-sized. Nothing corpus-sized shuffles, and probe cost is
    * bounded by the batch's term selectivity, not the corpus.
    *
    * `filter`: optional predicate over the index's metadata columns
    * (stored via [[build]]'s `metaCols` beside every posting — the
    * [[AnnIndex.topK]] filtered-search contract): "top-k among docs
    * WHERE lang = 'en'". Applied to the postings scan itself, so
    * Catalyst pushes it into the partition-pruned parquet read and
    * excluded docs never become candidates. Corpus statistics (df,
    * avgdl, N) stay GLOBAL — surviving docs keep their unfiltered
    * scores, so the result is exactly the unfiltered ranking with
    * non-matching docs removed (replayable by post-filtering a global
    * score table).
    *
    * `maxDfFrac` (< 1.0 to enable): drop query terms whose corpus df
    * exceeds this fraction of N before candidate generation — the
    * stopword cap. A term in most documents fans every probe out by
    * ~the corpus while its idf (and thus its score contribution) is
    * near zero micro-points; capping bounds candidate work at
    * O(queries · maxDfFrac · N) worst-case. Scores then differ from
    * the uncapped ranking by exactly the dropped terms' (tiny)
    * contributions — an explicit, opt-in trade.
    *
    * `prune` (default on): MaxScore-style RANK-SAFE dynamic pruning
    * (Turtle & Flood 1995), the serving-grade answer to the one probe
    * cost that is otherwise corpus-shaped — without it every posting
    * of every query term is scored, so a common term means an
    * O(df) ≈ O(corpus) aggregation per batch. With it:
    *
    *   1. SEED a per-query threshold θ: exactly score only the 2
    *      highest-impact terms per query (impact bound = contrib at
    *      the dfd's (max_tf, min_dl) — ≥ every real posting of the
    *      term since the contribution is increasing in tf, decreasing
    *      in dl); θ = the k-th best seed score. Any doc's true score
    *      only exceeds its partial, so ≥ k docs truly score ≥ θ.
    *   2. SPLIT terms per query: the maximal ascending-impact prefix
    *      whose bound-sum stays BELOW θ is non-essential — a doc
    *      containing only those cannot reach the top k. Candidate
    *      generation scans ONLY essential terms' postings; a common
    *      term (huge df, tiny idf ⇒ tiny bound) is exactly what lands
    *      non-essential, so its corpus-sized postings never fan out.
    *   3. TIGHTEN θ to the k-th essential partial, drop candidates
    *      whose partial + Σ non-essential bounds < θ, and complete
    *      ONLY the survivors' scores against the non-essential
    *      postings (semi-joined during the scan — candidate-bounded
    *      aggregation, columnar-scan-speed IO).
    *
    * Every survivor's final score is the exact full sum, the true
    * top-k provably survives every cut, and ties rank identically —
    * so the output is BIT-IDENTICAL to the exhaustive probe (the
    * parity spec randomizes corpora over both paths; the oracle
    * queries run with pruning on). Probes with fewer than
    * [[PruneMinPostings]] total query-term postings (the seed round
    * trips would cost more than they save), or against a pre-bounds
    * index layout, take the exhaustive path — same answer either way.
    */
  def topDocs(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.5,
      b: Double = 0.75,
      queryTextCol: String = "text",
      queryIdCol: String = "query_id",
      filter: Option[Column] = None,
      maxDfFrac: Double = 1.0,
      prune: Boolean = true): DataFrame = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params: k1=$k1, b=$b")
    require(maxDfFrac > 0 && maxDfFrac <= 1.0, s"maxDfFrac must be in (0, 1]: $maxDfFrac")
    checkIndex(spark, dir)
    val nTb = readNTb(spark, dir)
    val qt = queries.select(
      col(queryIdCol).cast("long").as("query_id"),
      explode(TextAnalysis.tokens(col(queryTextCol))).as("term"))
      .distinct()
      .localCheckpoint() // feeds the bucket collect AND two joins
    // Corpus stats: deltas sum exactly and collect driver-side (ONE
    // row, inlined as literals — a 1-row crossJoin would plan the
    // BroadcastNestedLoopJoin the plan audit bans); avgdl's division
    // is the same IEEE op as the one-shot's.
    val (nDocs, sumDl) = spark.read.parquet(statsPath(dir))
      .agg(coalesce(sum($"n_docs"), lit(0L)), coalesce(sum($"sum_dl"), lit(0L)))
      .as[(Long, Long)].head()
    val avgdl = if (nDocs == 0) 1.0 else sumDl.toDouble / nDocs.toDouble
    // Pre-bounds index layouts (no max_tf/min_dl in dfd) can't bound
    // impacts — exhaustive, as before the sidecar existed.
    val hasBounds = {
      val fields = spark.read.parquet(dfdPath(dir)).schema.fieldNames.toSet
      fields.contains("max_tf") && fields.contains("min_dl")
    }
    if (!prune || !hasBounds)
      topDocsExhaustive(spark, dir, k, k1, b, filter, maxDfFrac, nTb, qt, nDocs, avgdl)
    else
      topDocsPruned(spark, dir, k, k1, b, filter, maxDfFrac, nTb, qt, nDocs, avgdl)
  }

  /** Below this many total query-term postings the exhaustive probe is
    * taken even with `prune` on — the pruned path's extra driver round
    * trips (seed + threshold collects) cost more than scoring every
    * posting of a small candidate set. A VAR only so the parity spec
    * can force pruning on spec-sized corpora; production never writes
    * it. The gate reads only deterministic index state (df sums), so
    * either way the answer is identical. 10k ≈ the point where one
    * aggregation task's worth of postings outweighs two driver round
    * trips — low enough that the sf0.01 DuckDB correctness gate runs
    * the PRUNED path (rank-safety held to the hash gate, not just the
    * parity spec).
    */
  private[graft] var PruneMinPostings: Long = 10000L

  /** Diagnostic only: the path the LAST [[topDocs]] call planned
    * ("pruned" or "exhaustive") — asserted by the parity spec so the
    * pruned path can never be silently gated out of its own tests.
    */
  @volatile private[graft] var lastProbePath: String = ""

  /** The shared final ranking: (query_id, doc_id, rank, score_micro)
    * by (score desc, doc_id asc) through the bounded-heap top-k.
    */
  private def rankTail(scores: DataFrame, k: Int): DataFrame =
    Similarity.rankTopK(
      scores.select(col("query_id"), col("doc_id").as("neighbor_id"),
        col("score_micro").cast("double").as("score")), k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("rank"), col("score").cast("long").as("score_micro"))

  /** The exhaustive probe: every posting of every (kept) query term is
    * scored. Bucket-pruned and candidate-bounded in SHUFFLE terms, but
    * the aggregation WORK is O(sum of query-term df) — corpus-shaped
    * for common terms, which is why [[topDocsPruned]] exists.
    */
  /** Above this many distinct probe terms the pushed `term IN` scan
    * filter is skipped (an In literal list has planning cost, and
    * parquet or-pushdown degrades to a range past the reader's
    * threshold anyway) — the join still restricts rows, only the
    * row-group-skip IO win is forgone. Identical answer either way.
    */
  private val MaxTermPushdown = 2048

  private def topDocsExhaustive(
      spark: SparkSession, dir: String, k: Int, k1: Double, b: Double,
      filter: Option[Column], maxDfFrac: Double, nTb: Int,
      qt: DataFrame, nDocs: Long, avgdl: Double,
      preTermStats: Option[Array[(String, Long, Long, Long, Int)]] = None): DataFrame = {
    import spark.implicits._
    lastProbePath = "exhaustive"
    // Static partition pruning, the AnnIndex probed-cell discipline:
    // the distinct (term, bucket) set is bounded by the term count
    // (and by n_tb), so ONE collect feeds both the partition filter
    // and the pushed term filter — postings are term-SORTED within
    // each file, so the In predicate's row-group stats/dictionary
    // skipping reads only the query terms' posting runs. When the
    // MaxScore gate routed here, its collected per-term stats are
    // handed over (`preTermStats`) so the probe never aggregates the
    // dfd twice.
    val termTb: Array[(String, Int)] = preTermStats match {
      case Some(ts) => ts.map(t => (t._1, t._5))
      case None => qt.select($"term", tbOf($"term", nTb).as("tb"))
        .distinct().as[(String, Int)].collect()
    }
    val tbs = termTb.map(_._2).distinct.sorted
    val tbFilter = col("tb").isin(tbs.map(Integer.valueOf).toIndexedSeq: _*)
    val termList = termTb.map(_._1).distinct.sorted
    val termFilter: Option[Column] =
      if (termList.length <= MaxTermPushdown) Some(col("term").isin(termList.toIndexedSeq: _*))
      else None
    def pushTerms(df: DataFrame): DataFrame = termFilter.fold(df)(df.filter)
    // Query-term df: the gate's collected sums when routed from there
    // (a LocalRelation — same Spark-aggregated values, zero extra
    // scan), else a pruned dfd scan, semi against the terms, deltas
    // summed — query-term-sized either way. The idf is computed by the
    // SAME shared column expression in both cases.
    val df = preTermStats match {
      case Some(ts) => ts.toSeq.map(t => (t._1, t._2)).toDF("term", "df")
      case None =>
        val terms = qt.select($"term").distinct()
        pushTerms(spark.read.parquet(dfdPath(dir)).filter(tbFilter))
          .join(broadcast(terms), Seq("term"), "left_semi")
          .groupBy("term").agg(sum("df").as("df"))
    }
    // Stopword cap: drop ubiquitous query terms BEFORE candidate
    // generation (see the maxDfFrac scaladoc). The kept-term set is
    // query-term-sized; pruning qt with it keeps the dropped terms'
    // postings from ever fanning out.
    val dfKept =
      if (maxDfFrac >= 1.0) df
      else df.filter(col("df").cast("double") <= lit(maxDfFrac) * lit(nDocs.toDouble))
    val qtK =
      if (maxDfFrac >= 1.0) qt
      else qt.join(broadcast(dfKept.select($"term")), Seq("term"), "left_semi")
        .localCheckpoint()
    val idf = dfKept
      .select($"term", Bm25.idfMicro(lit(nDocs), $"df").as("idf_micro"))
    // The broadcast hints bypass Spark's size threshold — guard them
    // (the serving-tier discipline): qt is Q x terms rows, idf at most
    // that many. Past the guard both joins fall back to shuffles of the
    // PRUNED candidate stream; the static partition pruning above is
    // independent of join strategy.
    val qtRows = qt.count()
    val qtBytes = qtRows * 96L
    val qtSide = if (qtBytes <= Similarity.BroadcastGuardBytes) broadcast(qtK) else qtK
    val idfSide = if (qtBytes <= Similarity.BroadcastGuardBytes) broadcast(idf) else idf
    val scan0 = pushTerms(spark.read.parquet(postingsPath(dir)).filter(tbFilter))
    // The metadata predicate applies to the scan itself (postings carry
    // the index's metadata columns for exactly this): excluded docs
    // never become candidates, and the filter pushes into the pruned
    // parquet read.
    val cands0 = filter.fold(scan0)(scan0.filter)
      .join(qtSide, "term")
    // Takedowns vanish immediately: candidate-bounded anti-join against
    // the (guarded-broadcast, takedown-sized) tombstone set.
    val cands = readTombstones(spark, dir)
      .fold(cands0)(t =>
        cands0.join(Similarity.guardedRowBroadcast(t), Seq("doc_id"), "left_anti"))
    val scores = cands
      .join(idfSide, "term")
      .select($"query_id", $"doc_id",
        Bm25.contribMicro($"tf", $"dl", lit(avgdl), $"idf_micro", k1, b).as("c_micro"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c_micro").as("score_micro"))
    rankTail(scores, k)
  }

  /** The MaxScore probe (see the [[topDocs]] scaladoc for the
    * three-phase contract and the safety argument). Driver state is
    * BATCH-bounded: the collected (term, df, bounds) table and the
    * (query, term) pairs — never anything corpus-sized.
    */
  private def topDocsPruned(
      spark: SparkSession, dir: String, k: Int, k1: Double, b: Double,
      filter: Option[Column], maxDfFrac: Double, nTb: Int,
      qt: DataFrame, nDocs: Long, avgdl: Double): DataFrame = {
    import spark.implicits._
    // Driver mirrors of the SHARED column expression trees (same IEEE
    // ops in the same order — JVM doubles are strict, so these equal
    // the codegen'd values bit-for-bit). They feed only the pruning
    // DECISIONS; every emitted score is computed distributed, through
    // the column expressions themselves.
    def idfMicroD(df: Long): Long =
      math.floor(math.log(1.0 + (((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5))) *
        1000000.0 + 0.5).toLong
    def contribMicroD(tf: Long, dl: Long, idfM: Long): Long = {
      val tfpart = (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
      math.floor(idfM.toDouble * tfpart + 0.5).toLong
    }
    val termTbAll = qt.select($"term", tbOf($"term", nTb).as("tb"))
      .distinct().as[(String, Int)].collect()
    val tbsAll = termTbAll.map(_._2).distinct.sorted
    val tbFilterAll = col("tb").isin(tbsAll.map(Integer.valueOf).toIndexedSeq: _*)
    val allTerms = termTbAll.map(_._1).distinct.sorted
    // Pushed term filter for every scan of this probe: postings files
    // are term-sorted, so In(term, ...) skips row groups holding no
    // query term (see MaxTermPushdown).
    def pushTerms(df: DataFrame, ts: Seq[String]): DataFrame =
      if (ts.length <= MaxTermPushdown) df.filter(col("term").isin(ts: _*)) else df
    // One pruned dfd pass collects df + impact bounds + the term's
    // bucket (functionally dependent on the term) — query-term-sized.
    val termStats = pushTerms(spark.read.parquet(dfdPath(dir)).filter(tbFilterAll),
        allTerms.toIndexedSeq)
      .join(broadcast(qt.select($"term").distinct()), Seq("term"), "left_semi")
      .groupBy("term").agg(sum("df").as("df"),
        max("max_tf").as("max_tf"), min("min_dl").as("min_dl"),
        first("tb").as("tb"))
      .as[(String, Long, Long, Long, Int)].collect()
    val kept = termStats.filter { case (_, df, _, _, _) =>
      maxDfFrac >= 1.0 || df.toDouble <= maxDfFrac * nDocs.toDouble
    }
    // term -> (idf, impact upper bound, bucket)
    val info: Map[String, (Long, Long, Int)] = kept.map { case (t, df, mtf, mdl, tb) =>
      val idfM = idfMicroD(df)
      t -> (idfM, contribMicroD(mtf, mdl, idfM), tb)
    }.toMap
    val dfOf: Map[String, Long] = kept.map(t => t._1 -> t._2).toMap
    val qtPairs = qt.as[(Long, String)].collect().filter(p => info.contains(p._2))
    val byQuery: Map[Long, Array[String]] =
      qtPairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ubOf = (t: String) => info(t)._2
    // Cost gate 1: tiny probes skip the seed round trips (identical
    // answer; see PruneMinPostings).
    val totalDf = qtPairs.map(_._2).distinct.map(dfOf).sum
    if (totalDf <= PruneMinPostings)
      return topDocsExhaustive(spark, dir, k, k1, b, filter, maxDfFrac, nTb, qt, nDocs, avgdl,
        preTermStats = Some(termStats))
    // Cost gate 2 — the adaptive MaxScore decision, from stats already
    // in hand. The gate predicts the seed threshold with a REALISTIC
    // per-term contribution, tf = 1 at dl = avgdl (what a typical
    // matching doc scores), NOT the impact bound: bounds use per-term
    // extremes (max_tf, min_dl), so a θ̂ built from them overestimates
    // the achievable threshold and calls near-uniform batches prunable
    // when the real θ will keep every term essential — measured as a
    // 2-4x probe REGRESSION on the benchmark corpus (every query term
    // ~78% df, all alike: nothing is skippable, but θ̂ said 53% was).
    // θ̃ = Σ of the two best typical contributions; a term whose
    // ascending-bound prefix stays under θ̃ is LIKELY non-essential
    // under the real θ. Below half the exhaustive aggregation's rows
    // (Σ per-pair df) likely-skippable, MaxScore cannot recoup its
    // seed/completion passes and checkpoints: take the exhaustive
    // path. (The gate only picks the PLAN — either path returns
    // bit-identical rows; the real split still uses the real θ.)
    // Impact-uniform workloads (small shared vocabularies, every term
    // genuinely competing) go exhaustive; Zipf text (common terms own
    // most postings at near-zero idf) goes pruned.
    // tf = 1 at dl = avgdl saturates to tfpart = (k1+1)/(1+k1·((1−b)+b))
    // = 1 for EVERY (k1, b) — the typical contribution is exactly the
    // term's idf in micro-nats.
    val typOf: Map[String, Long] = info.map { case (t, (idfM, _, _)) => t -> idfM }
    val pairDfTotal = qtPairs.map(p => dfOf(p._2)).sum
    val skippableDf = byQuery.valuesIterator.map { ts =>
      if (ts.length < 2) 0L
      else {
        val thetaTilde = ts.map(typOf).sorted(Ordering[Long].reverse).take(2).sum
        val asc = ts.sortBy(t => (ubOf(t), t))
        var cum = 0L; var skip = 0L; var stop = false
        asc.foreach { t =>
          if (!stop) {
            cum += ubOf(t)
            if (cum < thetaTilde) skip += dfOf(t) else stop = true
          }
        }
        skip
      }
    }.sum
    if (skippableDf * 2L < pairDfTotal)
      return topDocsExhaustive(spark, dir, k, k1, b, filter, maxDfFrac, nTb, qt, nDocs, avgdl,
        preTermStats = Some(termStats))
    lastProbePath = "pruned"
    val tombSide = readTombstones(spark, dir).map(Similarity.guardedRowBroadcast(_))
    val pairBytes = qtPairs.length.toLong * 96L
    // Exact scores of a (query, term, idf) pair list against the
    // postings: bucket-pruned scan, metadata filter pushed, takedowns
    // anti-joined, candidate-sized aggregation — the same kernel as
    // the exhaustive probe, restricted to the given pairs.
    def scoreSubset(pairs: Seq[(Long, String)]): DataFrame = {
      val pdf = pairs.map { case (q, t) => (q, t, info(t)._1) }
        .toDF("query_id", "term", "idf_micro")
      val pSide = if (pairBytes <= Similarity.BroadcastGuardBytes) broadcast(pdf) else pdf
      val ptbs = pairs.map(p => info(p._2)._3).distinct.sorted
      val scan = pushTerms(
        spark.read.parquet(postingsPath(dir))
          .filter(col("tb").isin(ptbs.map(Integer.valueOf).toIndexedSeq: _*)),
        pairs.map(_._2).distinct.sorted)
      val scanF = filter.fold(scan)(scan.filter)
      val joined = scanF.join(pSide, "term")
      val cands = tombSide.fold(joined)(t => joined.join(t, Seq("doc_id"), "left_anti"))
      cands.select($"query_id", $"doc_id",
          Bm25.contribMicro($"tf", $"dl", lit(avgdl), $"idf_micro", k1, b).as("c_micro"))
        .groupBy("query_id", "doc_id")
        .agg(sum("c_micro").as("score_micro"))
    }
    // k-th best score per query of a scored frame (absent = fewer than
    // k candidates = no pruning threshold for that query).
    def kthScore(scores: DataFrame): Map[Long, Long] =
      Similarity.rankTopK(
        scores.select($"query_id", $"doc_id".as("neighbor_id"),
          $"score_micro".cast("double").as("score")), k)
        .filter(col("rank") === k)
        .select($"query_id", $"score".cast("long")).as[(Long, Long)].collect().toMap

    // Phase 1 — seed θ from the 2 highest-impact terms per query. The
    // seed scores are checkpointed: they are also (usually) the first
    // installment of the essential partials, so the seed terms'
    // postings are scanned once, not twice.
    val seedPairs = byQuery.toSeq.flatMap { case (q, ts) =>
      ts.sortBy(t => (-ubOf(t), t)).take(2).map(t => (q, t))
    }
    val seedScores = scoreSubset(seedPairs).localCheckpoint()
    val theta1 = kthScore(seedScores)

    // Phase 2 — essential split: ascending-impact prefix with
    // bound-sum < θ is non-essential. cut = first index whose prefix
    // sum reaches θ (always exists when θ > 0: θ is an achieved score,
    // so the full bound sum is ≥ θ; defensively, cut < 0 keeps
    // everything essential — pruning may only ever shrink).
    val splits: Map[Long, (Seq[String], Seq[String], Long)] = byQuery.map {
      case (q, ts) =>
        val theta = theta1.getOrElse(q, 0L)
        if (theta <= 0L) q -> ((ts.toSeq, Seq.empty[String], 0L))
        else {
          val asc = ts.sortBy(t => (ubOf(t), t)).toSeq
          val cums = asc.scanLeft(0L)((a, t) => a + ubOf(t)).tail
          val cut = cums.indexWhere(_ >= theta)
          if (cut < 0) q -> ((asc, Seq.empty[String], 0L))
          else q -> ((asc.drop(cut), asc.take(cut), asc.take(cut).map(ubOf).sum))
        }
    }
    val essPairs = splits.toSeq.flatMap { case (q, (ess, _, _)) => ess.map(t => (q, t)) }
    val nonEssPairs = splits.toSeq.flatMap { case (q, (_, ne, _)) => ne.map(t => (q, t)) }
    // Seed reuse: when every seed pair stayed essential (the normal
    // case — seeds are the TOP-bound terms), the essential partial is
    // seedScores + the not-yet-scored essential pairs, re-aggregated
    // over the union (candidate-sized). A seed pair that landed
    // non-essential (θ above its query's whole bound tail) falls back
    // to scoring the essential set from scratch — correctness first.
    val essSet = essPairs.toSet
    val partial0 =
      if (seedPairs.forall(essSet)) {
        val extra = essPairs.filterNot(seedPairs.toSet)
        if (extra.isEmpty) seedScores
        else seedScores.unionByName(scoreSubset(extra))
          .groupBy("query_id", "doc_id")
          .agg(sum("score_micro").as("score_micro"))
      } else scoreSubset(essPairs)
    val partial = partial0.localCheckpoint()
    if (nonEssPairs.isEmpty)
      return rankTail(partial, k) // every term essential: partial IS exact

    // Phase 3 — tighten θ with the k-th essential partial, keep only
    // candidates whose certain-part + non-essential slack can still
    // reach it (>= : a tie at θ may enter the top k on the doc_id
    // tie-break), then complete ONLY the survivors.
    val theta2 = kthScore(partial)
    val metaDF = splits.toSeq.map { case (q, (_, _, slack)) =>
      (q, slack, math.max(theta1.getOrElse(q, 0L), theta2.getOrElse(q, 0L)))
    }.toDF("query_id", "slack", "theta")
    val survivors = partial.join(broadcast(metaDF), "query_id")
      .filter($"score_micro" + $"slack" >= $"theta")
      .select($"query_id", $"doc_id", $"score_micro")
      .localCheckpoint()
    // The completing scan reads the non-essential (common) terms'
    // buckets but aggregates only survivor rows: the doc-level semi
    // applies DURING the scan, the (query, doc) semi right after the
    // pair join — both guarded broadcasts. Tombstones and the metadata
    // filter are already enforced through the survivor set itself.
    val survDocs = Similarity.guardedRowBroadcast(survivors.select("doc_id").distinct())
    val survPairs = Similarity.guardedRowBroadcast(
      survivors.select("query_id", "doc_id"), perRowBytes = 64L)
    val nePdf = nonEssPairs.map { case (q, t) => (q, t, info(t)._1) }
      .toDF("query_id", "term", "idf_micro")
    val neSide = if (pairBytes <= Similarity.BroadcastGuardBytes) broadcast(nePdf) else nePdf
    val neTbs = nonEssPairs.map(p => info(p._2)._3).distinct.sorted
    val neScan0 = pushTerms(
      spark.read.parquet(postingsPath(dir))
        .filter(col("tb").isin(neTbs.map(Integer.valueOf).toIndexedSeq: _*)),
      nonEssPairs.map(_._2).distinct.sorted)
    val neScan = filter.fold(neScan0)(neScan0.filter)
    val addC = neScan
      .join(survDocs, Seq("doc_id"), "left_semi")
      .join(neSide, "term")
      .join(survPairs, Seq("query_id", "doc_id"), "left_semi")
      .select($"query_id", $"doc_id",
        Bm25.contribMicro($"tf", $"dl", lit(avgdl), $"idf_micro", k1, b).as("c_micro"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c_micro").as("add_micro"))
    val scores = survivors.join(addC, Seq("query_id", "doc_id"), "left_outer")
      .select($"query_id", $"doc_id",
        ($"score_micro" + coalesce($"add_micro", lit(0L))).as("score_micro"))
    rankTail(scores, k)
  }
}
