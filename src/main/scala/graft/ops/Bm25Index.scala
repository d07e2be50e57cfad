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
  *   dir/lex/dfd/tb=<b>/         (term, df)                      df deltas
  *   dir/lex/stats/              (n_docs, sum_dl)                stat deltas
  *   dir/tombstones/             (doc_id)                        takedowns
  * }}}
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
      val staging = new org.apache.hadoop.fs.Path(s"$dir/_build_tmp")
      fs.delete(staging, true)
      // postings feed three writes (postings, dfd, stats) — pin one
      // evaluation or the corpus tokenize+shuffle replays per branch.
      val posts = postingsOf(docs, textCol, idCol, metaCols)
        .withColumn("tb", tbOf(col("term"), nTb))
        .localCheckpoint()
      // Salt caps the layout at <= 8 files per term bucket while still
      // writing a hot bucket with 8-way parallelism (the AnnIndex.build
      // discipline).
      posts
        .repartition(col("tb"), pmod(hash(col("doc_id")), lit(8)))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$dir/_build_tmp/lex/postings")
      posts.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("tb", tbOf(col("term"), nTb))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$dir/_build_tmp/lex/dfd")
      val nDocs = writeStatsDelta(spark, posts, s"$dir/_build_tmp/lex/stats", "overwrite")
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

  /** One (n_docs, sum_dl) stats delta from a postings frame. Returns
    * the doc count. `sum_dl` sums each doc's length ONCE (dl rides on
    * every posting row, so the per-doc row set is distinct'd first —
    * (doc_id, dl) is functionally dependent, the distinct is exact).
    */
  private def writeStatsDelta(
      spark: SparkSession, posts: DataFrame, path: String, mode: String): Long = {
    import spark.implicits._
    // coalesce: sum over an EMPTY frame is null (an empty build or an
    // empty streaming micro-batch must write a (0, 0) delta, not NPE).
    val row = posts.select($"doc_id", $"dl").distinct()
      .agg(count(lit(1)).as("n_docs"), coalesce(sum($"dl"), lit(0L)).as("sum_dl"))
      .as[(Long, Long)].head()
    Seq(row).toDF("n_docs", "sum_dl").repartition(1)
      .write.mode(mode).parquet(path)
    row._1
  }

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
    val nTb = readNTb(spark, dir)
    val meta = indexMetaCols(spark, dir)
    requireMeta(docs, meta, dir)
    val posts = postingsOf(docs, textCol, idCol, meta)
      .withColumn("tb", tbOf(col("term"), nTb))
      .localCheckpoint() // three writes, one evaluation
    posts.repartition(col("tb"))
      .write.mode("append").partitionBy("tb").parquet(postingsPath(dir))
    posts.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("tb", tbOf(col("term"), nTb))
      .repartition(col("tb"))
      .write.mode("append").partitionBy("tb").parquet(dfdPath(dir))
    writeStatsDelta(spark, posts, statsPath(dir), "append")
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
      .fold(present)(t => present.join(broadcast(t), Seq("doc_id"), "left_anti"))
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
    * back to <= 8 files per term bucket. Returns the surviving doc
    * count.
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
        .join(broadcast(t), Seq("doc_id"), "left_anti"))
      .localCheckpoint()
    live.repartition(col("tb"), pmod(hash(col("doc_id")), lit(8)))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$dir/_compact_tmp/lex/postings")
    live.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("tb", tbOf(col("term"), nTb))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$dir/_compact_tmp/lex/dfd")
    val nDocs = writeStatsDelta(spark, live, s"$dir/_compact_tmp/lex/stats", "overwrite")
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
      val nTb = readNTb(spark, dir)
      val meta = indexMetaCols(spark, dir)
      val otherPosts = spark.read.parquet(postingsPath(otherDir))
      requireMeta(otherPosts, meta, dir)
      val live = readTombstones(spark, otherDir)
        .fold(otherPosts)(t =>
          otherPosts.join(broadcast(t), Seq("doc_id"), "left_anti"))
        .select(Seq(col("term"), col("doc_id"), col("tf"), col("dl")) ++
          meta.map(col): _*)
        .withColumn("tb", tbOf(col("term"), nTb)) // THIS index's bucketing
        .localCheckpoint()
      live.repartition(col("tb"))
        .write.mode("append").partitionBy("tb").parquet(postingsPath(dir))
      live.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("tb", tbOf(col("term"), nTb))
        .repartition(col("tb"))
        .write.mode("append").partitionBy("tb").parquet(dfdPath(dir))
      writeStatsDelta(spark, live, statsPath(dir), "append")
    }

  /** Operational snapshot: live docs, distinct terms (vocabulary),
    * postings data files (the [[compact]] trigger — each appended
    * batch adds up to n_tb files), stat deltas pending collapse, and
    * tombstones pending physical retirement.
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
    IndexStats(
      docs = stat.agg(sum($"n_docs")).as[Long].head() -
        readTombstones(spark, dir).fold(0L)(_.count()),
      terms = spark.read.parquet(dfdPath(dir)).select("term").distinct().count(),
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
      maxDfFrac: Double = 1.0): DataFrame = {
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
    // Static partition pruning, the AnnIndex probed-cell discipline:
    // the distinct query-term bucket set is bounded by the term count
    // (and by n_tb), so collecting it is free.
    val tbs = qt.select(tbOf($"term", nTb).as("tb")).distinct().as[Int].collect().sorted
    val tbFilter = col("tb").isin(tbs.map(Integer.valueOf).toIndexedSeq: _*)
    // Corpus stats: deltas sum exactly and collect driver-side (ONE
    // row, inlined as literals — a 1-row crossJoin would plan the
    // BroadcastNestedLoopJoin the plan audit bans); avgdl's division
    // is the same IEEE op as the one-shot's.
    val (nDocs, sumDl) = spark.read.parquet(statsPath(dir))
      .agg(coalesce(sum($"n_docs"), lit(0L)), coalesce(sum($"sum_dl"), lit(0L)))
      .as[(Long, Long)].head()
    val avgdl = if (nDocs == 0) 1.0 else sumDl.toDouble / nDocs.toDouble
    // Query-term df: pruned dfd scan, semi against the terms, deltas
    // summed — query-term-sized output.
    val terms = qt.select($"term").distinct()
    val df = spark.read.parquet(dfdPath(dir)).filter(tbFilter)
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy("term").agg(sum("df").as("df"))
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
    val scan0 = spark.read.parquet(postingsPath(dir)).filter(tbFilter)
    // The metadata predicate applies to the scan itself (postings carry
    // the index's metadata columns for exactly this): excluded docs
    // never become candidates, and the filter pushes into the pruned
    // parquet read.
    val cands0 = filter.fold(scan0)(scan0.filter)
      .join(qtSide, "term")
    // Takedowns vanish immediately: candidate-bounded anti-join against
    // the (broadcast, takedown-sized) tombstone set.
    val cands = readTombstones(spark, dir)
      .fold(cands0)(t => cands0.join(broadcast(t), Seq("doc_id"), "left_anti"))
    val scores = cands
      .join(idfSide, "term")
      .select($"query_id", $"doc_id",
        Bm25.contribMicro($"tf", $"dl", lit(avgdl), $"idf_micro", k1, b).as("c_micro"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c_micro").as("score_micro"))
    Similarity.rankTopK(
      scores.select($"query_id", $"doc_id".as("neighbor_id"),
        $"score_micro".cast("double").as("score")), k)
      .select($"query_id", $"neighbor_id".as("doc_id"),
        $"rank".cast("long").as("rank"), $"score".cast("long").as("score_micro"))
  }
}
