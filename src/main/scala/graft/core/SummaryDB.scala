package graft.core

import graft.windowing.WindowingSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The persistent multi-stream store: catalog + events + summary +
  * landmark tables under one directory — the Spark-native analogue of
  * the reference DB (`/root/reference/core/db.go:15-47`; stream metadata
  * per `protos/summarydb.capnp:47-54`).
  *
  * Layout (all Parquet):
  *   dir/stream_meta__vN        one row per declared stream
  *   dir/events                 raw appends (the reference's WAL role)
  *   dir/summary_windows__vN    the decayed materialized view
  *   dir/landmark_spans__vN     declared spans of matched landmark windows
  *   dir/landmark_elems__vN     exact landmark elements, ONE PER ROW
  *   dir/landmark_intervals__vN declared exact [t0,t1] spans
  *   dir/commits                batch-id markers for streaming replay
  *
  * Landmark elements are rows keyed by (streamId, windowId), never one
  * array per window: a landmark left open across a billion-event
  * stretch stays at constant row width instead of building toward
  * Spark's ~2 GB single-value ceiling; queries fold them into bounded
  * per-window digests distributively ([[QueryEngine.landmarkDigests]]).
  *
  * Crash safety (the reference's atomic "brew" commits,
  * `/root/reference/storage/badger_backend.go:210-263`): every table
  * rewrite lands in a fresh `__v<stamp>` directory; readers resolve the
  * highest version that carries Spark's `_SUCCESS` marker, so a crash at
  * any point leaves a complete older or newer table — never a partial
  * one. Older versions are pruned best-effort after a successful write.
  */
final class SummaryDB private (
    val spark: SparkSession,
    dir: String,
    mergeEvery: Int = 1) {
  import spark.implicits._
  require(mergeEvery >= 1, s"mergeEvery must be >= 1: $mergeEvery")

  private def p(name: String) = s"$dir/$name"

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------------ write lock

  /** Advisory single-writer guard on the versioned swap. The version
    * protocol is crash-safe for ONE writer (write-new + `_SUCCESS` +
    * prune), but two jobs opening the same dir could interleave their
    * multi-table swaps — each sees the other's half-applied frontier
    * and the losers' versions get pruned mid-read. So every public
    * mutating call (append/appendOnce/newStream/landmark ops/enable*)
    * holds `dir/_writer.lock` for the CALL's duration: acquired by
    * atomic create-if-absent, token-checked on release, reentrant
    * within the instance. A second concurrent writer fails loudly
    * instead of racing. Readers never take the lock — the `_SUCCESS`
    * resolution already guarantees they see only complete versions.
    *
    * Scoped (per call, not per instance) so sequential writers — the
    * normal reopen-after-restart flow, including streaming checkpoint
    * replay — need no handshake. A writer that DIES mid-call leaves a
    * stale lock; that is intentionally loud (the died writer may have
    * left an uncommitted batch worth inspecting) and is cleared with
    * [[SummaryDB.breakLock]].
    */
  private val lockPath = new Path(p("_writer.lock"))
  private var lockDepth = 0
  private var lockToken: String = _

  private def readLockHolder(): String =
    try {
      val in = fs.open(lockPath)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch { case _: Throwable => "<unreadable>" }

  private[graft] def withWriteLock[T](body: => T): T = {
    if (lockDepth == 0) {
      val token = java.util.UUID.randomUUID().toString +
        " pid=" + ProcessHandle.current().pid() + " at=" + System.currentTimeMillis()
      fs.mkdirs(new Path(dir))
      val out =
        try fs.create(lockPath, false)
        catch {
          case _: java.io.IOException => throw new IllegalStateException(
            s"SummaryDB at $dir is locked by another writer (${readLockHolder()}); " +
              "wait for it, or clear a stale lock from a dead writer with SummaryDB.breakLock")
        }
      try out.write(token.getBytes("UTF-8")) finally out.close()
      lockToken = token
    }
    lockDepth += 1
    try body
    finally {
      lockDepth -= 1
      if (lockDepth == 0) {
        // Token check: never delete a lock someone re-acquired after a
        // breakLock of ours.
        if (readLockHolder() == lockToken) fs.delete(lockPath, false)
        lockToken = null
      }
    }
  }

  // ------------------------------------------------------- versioned tables

  /** Newest complete version directory of `name`, if any. */
  private def currentVersion(name: String): Option[Path] = {
    val base = new Path(dir)
    if (!fs.exists(base)) return None
    val prefix = name + "__v"
    val versions = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .sortBy(s => s.getPath.getName.stripPrefix(prefix).toLong)
    versions.lastOption.map(_.getPath)
  }

  /** Write a fresh version of `name`, then prune older versions
    * (keeping one predecessor so a reader whose lazy plan still points
    * at the previous version is not yanked mid-query; older ones go).
    * Stamps are max(wall clock, newest existing + 1) — monotonic across
    * JVM restarts, unlike nanoTime whose origin resets on reboot.
    */
  private def writeVersioned(name: String, write: String => Unit): Unit = {
    val prefix = name + "__v"
    def versionsOnDisk(): Seq[Long] =
      if (!fs.exists(new Path(dir))) Seq.empty
      else fs.listStatus(new Path(dir)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(_.getPath.getName.stripPrefix(prefix).toLong)
    val stamp = math.max(System.currentTimeMillis(), versionsOnDisk().maxOption.getOrElse(0L) + 1L)
    write(p(s"$prefix$stamp"))
    val stale = versionsOnDisk().filter(_ < stamp).sorted.dropRight(1)
    stale.foreach { v =>
      try fs.delete(new Path(p(s"$prefix$v")), true) catch { case _: Throwable => () }
    }
  }

  private def readVersioned[T](name: String)(read: String => Dataset[T])(empty: => Dataset[T]): Dataset[T] =
    currentVersion(name).map(path => read(path.toString)).getOrElse(empty)

  // --------------------------------------------------------------- catalog

  private var metas: Map[Long, StreamMeta] = loadMetas()

  private def loadMetas(): Map[Long, StreamMeta] =
    readVersioned("stream_meta")(path => spark.read.parquet(path).as[StreamMeta])(
      spark.emptyDataset[StreamMeta])
      .collect().map(m => m.streamId -> m).toMap

  def streams: Map[Long, StreamMeta] = metas

  /** Declare a stream (operators + decay policy), as the reference's
    * `DB.NewStream` (`/root/reference/core/db.go:61-80`).
    */
  def newStream(meta: StreamMeta): Unit = withWriteLock {
    metas += meta.streamId -> meta
    writeVersioned("stream_meta",
      metas.values.toSeq.toDS().write.mode(SaveMode.Overwrite).parquet(_))
  }

  /** Per-stream decay policy as a SELF-CONTAINED serializable closure:
    * the summarizer/compactor ship it inside a row-level UDF, so it must
    * capture an immutable spec map — never `this` (SparkSession isn't
    * serializable) nor the live mutable catalog.
    */
  private def specOf: Long => WindowingSpec = {
    val specs: Map[Long, WindowingSpec] = metas.map { case (k, m) => (k, m.spec) }.toMap
    val dflt: WindowingSpec = StreamMeta.exponential(0L, 2.0).spec
    sid => specs.getOrElse(sid, dflt)
  }

  // ------------------------------------------------------------- intervals

  /** All landmark intervals ever declared (they are properties of the
    * DB's timeline, persisted so later appends keep honoring them).
    * Stored rows are (streamId, t0, t1); streamId = -1 means global
    * (applies to every stream).
    */
  private def storedIntervals: Seq[(Long, Long, Long)] =
    readVersioned("landmark_intervals")(path => spark.read.parquet(path).as[(Long, Long, Long)])(
      spark.emptyDataset[(Long, Long, Long)])
      .collect().toSeq.sorted

  def landmarkIntervals: Seq[(Long, Long)] =
    storedIntervals.filter(_._1 == -1L).map(r => (r._2, r._3))

  /** Per-stream exact intervals (the reference's per-stream
    * StartLandmark/EndLandmark surface).
    */
  def streamLandmarks: Map[Long, Seq[(Long, Long)]] =
    storedIntervals.filter(_._1 != -1L)
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap

  /** Declare an exact interval for one stream and re-summarize —
    * `StartLandmark(t0)` + `EndLandmark(t1)` in one call
    * (`/root/reference/core/stream.go:121-137`).
    */
  def newLandmark(streamId: Long, t0: Long, t1: Long): Unit = withWriteLock {
    require(t0 <= t1, s"bad landmark interval [$t0, $t1]")
    saveIntervals((storedIntervals :+ ((streamId, t0, t1))).distinct)
    refreshSummaries(landmarkIntervals)
    refreshRewriteRegistration()
  }

  /** The open-interval sentinel: an un-ended landmark absorbs every
    * element with ts >= t0 until [[endLandmark]] closes it.
    */
  private val OpenT1 = Long.MaxValue

  /** True iff the stream has a started-but-not-ended landmark. */
  def hasOpenLandmark(streamId: Long): Boolean =
    storedIntervals.exists(r => r._1 == streamId && r._3 == OpenT1)

  /** Open-ended landmark: from here on, the stream's elements with
    * ts >= t0 are stored exactly (diverted from decay), across any
    * number of appends, until [[endLandmark]] — the reference's
    * `StartLandmark` (`/root/reference/core/stream.go:121-128`).
    * Callable before any append (an empty DB just records the interval).
    */
  def startLandmark(streamId: Long, t0: Long): Unit = withWriteLock {
    require(!hasOpenLandmark(streamId),
      s"stream $streamId already has an open landmark")
    saveIntervals((storedIntervals :+ ((streamId, t0, OpenT1))).distinct)
    refreshSummaries(landmarkIntervals)
    refreshRewriteRegistration()
  }

  /** Close the stream's open landmark at t1 — the reference's
    * `EndLandmark` (`/root/reference/core/stream.go:130-137`). Elements
    * appended while it was open stay exact; later ones decay normally.
    */
  def endLandmark(streamId: Long, t1: Long): Unit = withWriteLock {
    val open = storedIntervals
      .find(r => r._1 == streamId && r._3 == OpenT1)
      .getOrElse(throw new IllegalStateException(
        s"stream $streamId has no open landmark"))
    require(t1 >= open._2, s"endLandmark($t1) precedes startLandmark(${open._2})")
    saveIntervals(storedIntervals.filterNot(_ == open) :+ ((streamId, open._2, t1)))
    refreshSummaries(landmarkIntervals)
    refreshRewriteRegistration()
  }

  private def saveIntervals(rows: Seq[(Long, Long, Long)]): Unit =
    writeVersioned("landmark_intervals",
      rows.toDS().write.mode(SaveMode.Overwrite).parquet(_))

  // ---------------------------------------------------------------- append

  /** Append a batch of raw elements and refresh the summaries.
    * `landmarkIntervals` declares additional exact [t0, t1] spans; all
    * previously declared spans stay in force (they are persisted), so a
    * later plain append never un-landmarks data.
    *
    * The batch is clamped against the stored time frontier (reference
    * monotonic repair, `core/pipeline.go:81-84`) BEFORE it is persisted,
    * so the events WAL and the summaries always agree — a later full
    * recompute (landmark declaration) reproduces exactly what the
    * incremental path built. Each batch lands in its own
    * `events/<tag>` directory carrying a monotone batch stamp, making
    * the WAL order deterministic for equal timestamps and the write
    * idempotent per tag.
    *
    * Without any landmark intervals the append is INCREMENTAL: the
    * batch becomes per-element fine windows and the summary table
    * re-coarsens by monoid merge ([[Compactor]]) — the WAL is never
    * re-read to maintain decay.
    */
  def append(
      events: Dataset[Event],
      landmarkIntervals: Seq[(Long, Long)] = Nil): Unit = withWriteLock {
    val tag = f"adhoc-${nextBatchStamp()}%09d"
    appendTagged(tag, events, landmarkIntervals, forceRecompute = false)
  }

  /** Idempotent append keyed by a streaming micro-batch id. A batch id
    * with a commit marker is skipped entirely (checkpoint REPLAY of
    * committed batches is a no-op). If the batch's events directory
    * exists without a marker — a crash landed between the data write
    * and the marker — the events are overwritten (same data, same tag)
    * and the summaries are recomputed from the WAL, which de-duplicates
    * the possibly-half-applied summary state.
    */
  def appendOnce(
      batchId: Long,
      events: Dataset[Event],
      landmarkIntervals: Seq[(Long, Long)] = Nil): Unit = withWriteLock {
    val marker = new Path(p("commits"), s"batch-$batchId")
    if (fs.exists(marker)) return
    val tag = s"batch-$batchId"
    val partialReplay = fs.exists(new Path(p("events"), tag))
    // appendTagged writes the commit marker itself (same path) once the
    // summaries reflect the batch.
    appendTagged(tag, events, landmarkIntervals, forceRecompute = partialReplay)
  }

  private def nextBatchStamp(): Long = {
    val eventsDir = new Path(p("events"))
    if (!fs.exists(eventsDir)) return 0L
    val dirs = fs.listStatus(eventsDir).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    // max(parsed tag suffix)+1 keeps the stamp monotone even after
    // compactWal GC shrinks the dir count (a compact-N segment's N is
    // the pre-compaction watermark, strictly above every bstamp it
    // absorbed); the dir-count form is kept as a floor for any dir
    // whose name carries no number.
    val bySuffix = dirs
      .flatMap(n => n.split("-").lastOption.flatMap(_.toLongOption))
      .maxOption.map(_ + 1L).getOrElse(0L)
    math.max(bySuffix, dirs.size.toLong)
  }

  private def appendTagged(
      tag: String,
      batch: Dataset[Event],
      newIntervals: Seq[(Long, Long)],
      forceRecompute: Boolean): Unit = {
    // Frontier: newest stored timestamp per stream (summary + landmark
    // spans — the span te IS the old landmark-window te).
    val fromSummary = summaryWindows.groupBy($"streamId").agg(max($"te").as("t"))
    val fromLandmarks = landmarkSpans.toDF().groupBy($"streamId").agg(max($"te").as("t"))
    val frontier: Map[Long, Long] = fromSummary.unionByName(fromLandmarks)
      .groupBy($"streamId").agg(max($"t"))
      .as[(Long, Long)].collect().toMap

    val bstamp = nextBatchStamp()
    val prepared = Ingest.prepare(
      batch.toDF().withColumn("arrival", col("seq")), baseTs = frontier)
    prepared.toDF()
      .withColumn("bstamp", lit(bstamp))
      .write.mode(SaveMode.Overwrite).parquet(s"${p("events")}/$tag")

    if (newIntervals.nonEmpty)
      saveIntervals((storedIntervals ++ newIntervals.map(iv => (-1L, iv._1, iv._2))).distinct)
    val all = this.landmarkIntervals
    if (all.nonEmpty || streamLandmarks.nonEmpty || forceRecompute)
      refreshSummaries(all, includeUncommittedTag = Some(tag))
    else appendIncremental(prepared)
    // Distinct sketches rank over ALL elements (landmark diversion
    // never removes a value from the distinct set), so the incremental
    // path applies even to landmarked stores. On crash REPLAY the
    // incremental path would re-apply a batch the sketch table may
    // already hold (it is written before the commit marker): HLL set
    // semantics would keep the estimates right, but the cs/ce element
    // bookkeeping would double-count and drift the partition off the
    // canonical decay — rebuild from the WAL instead, like the scalar
    // refreshSummaries path.
    if (distinctEnabled) {
      if (forceRecompute) rebuildDistinct(includeUncommittedTag = Some(tag))
      else appendIncrementalDistinct(prepared)
    }
    // Same replay discipline for the bloom/cms table: rebuild from the
    // WAL on forceRecompute, incremental fine-sketch union otherwise.
    if (freqEnabled) {
      if (forceRecompute) rebuildFreq(includeUncommittedTag = Some(tag))
      else appendIncrementalFreq(prepared)
    }
    // And for the bottom-k sample table (exact monoid — but the same
    // double-count drift would corrupt cs/ce bookkeeping on replay).
    if (sampleEnabled) {
      if (forceRecompute) rebuildSample(includeUncommittedTag = Some(tag))
      else appendIncrementalSample(prepared)
    }
    // And for the quantile sketch table (KLL merges are lossy-but-
    // certified; replay double-application would both drift cs/ce and
    // double the sketch weights — rebuild from the WAL instead).
    if (quantileEnabled) {
      if (forceRecompute) rebuildQuantile(includeUncommittedTag = Some(tag))
      else appendIncrementalQuantile(prepared)
    }
    // The summaries now reflect this batch: commit it. A crash before
    // this line leaves an unmarked events/<tag> dir that readEvents
    // skips, so a later recompute can never resurrect a batch the
    // incremental summaries never absorbed (ADVICE r2: the WAL and the
    // summary table must agree under every crash point).
    fs.mkdirs(new Path(p("commits")))
    fs.create(new Path(p("commits"), tag), true).close()
    refreshRewriteRegistration()
    refreshDistinctRegistration()
    refreshFreqRegistration()
  }

  // ---------------------------------------------------------- merge cadence

  /** One re-coarsening cadence counter per summary KIND (scalar /
    * distinct / freq / sample), all sharing [[SummaryDB.open]]'s
    * `mergeEvery` knob — a single controller instead of one mutable
    * field per kind, so new summary kinds get cadence by key and the
    * kinds cannot drift behaviorally. Counters are session-scoped by
    * design (cadence restarts on reopen — it is not durable state) and
    * advance independently: not every kind is exercised by every
    * append (the scalar path skips landmarked stores; the sketch paths
    * run regardless).
    */
  private val sinceMerge = collection.mutable.Map.empty[String, Int]

  /** Advance `kind`'s cadence; true on every `mergeEvery`-th call. */
  private def mergeDue(kind: String): Boolean = {
    val n = sinceMerge.getOrElse(kind, 0) + 1
    sinceMerge(kind) = if (n >= mergeEvery) 0 else n
    n >= mergeEvery
  }

  /** Old summary + fine windows of the (already clamped) batch ->
    * canonical partition at the new N, by pure monoid re-merge.
    */
  private def appendIncremental(prepared: Dataset[Event]): Unit = {
    val old = summaryWindows.persist()
    try {
      val baseCounts = old
        .groupBy($"streamId").agg((max($"ce") + 1L).as("n"))
      val fine = Compactor.fineWindows(prepared, baseCounts)
      val next =
        if (mergeDue("scalar")) Compactor.recoarsen(old.unionByName(fine), specOf)
        else old.unionByName(fine) // merge deferred: fine windows persist as-is
      writeVersioned("summary_windows",
        next.toDF().write.mode(SaveMode.Overwrite).parquet(_))
    } finally old.unpersist()
  }

  /** Recompute summary + landmark tables from the persisted events.
    * `includeUncommittedTag`: the batch currently being applied — its
    * events dir exists but its commit marker is written only after this
    * refresh succeeds.
    */
  private def refreshSummaries(
      intervals: Seq[(Long, Long)],
      includeUncommittedTag: Option[String] = None): Unit = {
    val events = readEvents(includeUncommittedTag)
    val perStream = streamLandmarks
    val (sw, spans, elems) =
      if (intervals.isEmpty && perStream.isEmpty)
        (Summarizer.summarizePerStream(events, specOf),
          spark.emptyDataset[LandmarkSpan], spark.emptyDataset[LandmarkElem])
      else Summarizer.summarizeWithLandmarkRowsPerStream(
        events, specOf, intervals, perStream = perStream)
    writeVersioned("summary_windows", sw.toDF().write.mode(SaveMode.Overwrite).parquet(_))
    writeVersioned("landmark_spans", spans.toDF().write.mode(SaveMode.Overwrite).parquet(_))
    writeVersioned("landmark_elems", elems.toDF().write.mode(SaveMode.Overwrite).parquet(_))
  }

  /** Re-rank the persisted events into dense per-stream order. Arrival
    * order = (batch stamp, in-batch seq) — globally unique, so the
    * equal-timestamp tiebreak is deterministic across refreshes.
    * Timestamps were clamped at append time, so sorting by ts
    * reproduces the append order exactly.
    *
    * Only COMMITTED batch dirs are read (plus `includeTag`, the batch
    * being applied right now): an events dir without a commit marker is
    * a crash orphan whose data never reached the summaries, and reading
    * it would silently change previously-answered ranges. Returns empty
    * on a fresh DB with no events yet (ADVICE r2: StartLandmark before
    * any append must work).
    */
  private def committedEventDirs(includeTag: Option[String] = None): Seq[Path] = {
    val eventsDir = new Path(p("events"))
    if (!fs.exists(eventsDir)) return Seq.empty
    // Tags absorbed into a compact segment are superseded the moment
    // the segment's manifest-marker lands — skipped here even while
    // their own dirs/markers still exist (GC is lazy), so no reader
    // ever double-counts a batch mid-compaction.
    val replaced = replacedTags()
    fs.listStatus(eventsDir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(d => !replaced.contains(d.getName))
      .filter(d => includeTag.contains(d.getName) ||
        fs.exists(new Path(p("commits"), d.getName)))
  }

  /** Union of every compact manifest's replaced-tag list. */
  private def replacedTags(): Set[String] = {
    val commits = new Path(p("commits"))
    if (!fs.exists(commits)) return Set.empty
    fs.listStatus(commits).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("compact-"))
      .flatMap { s =>
        val in = fs.open(s.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      }
      .filter(_.nonEmpty).toSet
  }

  /** Consolidate the committed WAL into one compact segment — the
    * streaming-cadence hygiene call: a 1-minute-batch day leaves 1440
    * tiny event dirs whose listing and footer reads tax every
    * `readEvents`/`rawEvents`; after compaction one segment holds the
    * same ROWS (per-row `bstamp` is data, so the derived arrival order
    * is byte-identical) in `spark.sparkContext.defaultParallelism`
    * files. Summaries and sketch tables are untouched — this is an IO
    * layout change, not a semantic one.
    *
    * Crash-safe in both windows: a segment written but not yet
    * manifested is an orphan no reader sees (no commit marker); once
    * the manifest-marker lands, the replaced tags are superseded
    * atomically and their dirs become garbage, collected lazily here
    * (and by any later compaction) — a crash between manifest and GC
    * only delays the deletes.
    *
    * Raw data is deliberately KEPT (consolidated, not truncated): the
    * reference discards raw elements after decay, but this engine's
    * landmark declarations over past data and crash-replay rebuilds
    * re-read the WAL, and 100 TB pipelines treat the raw corpus as the
    * system of record.
    */
  def compactWal(): Unit = withWriteLock {
    gcReplacedDirs()
    val dirs = committedEventDirs()
    if (dirs.size < 2) return
    val stamp = nextBatchStamp()
    val tag = f"compact-$stamp%09d"
    spark.read.parquet(dirs.map(_.toString): _*)
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism))
      .write.mode(SaveMode.Overwrite).parquet(s"${p("events")}/$tag")
    // Manifest-marker: the compact segment's commit marker LISTS the
    // tags it supersedes — one atomic create flips readers over.
    fs.mkdirs(new Path(p("commits")))
    val out = fs.create(new Path(p("commits"), tag), true)
    try out.write(dirs.map(_.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    gcReplacedDirs()
    refreshRewriteRegistration()
    refreshDistinctRegistration()
    refreshFreqRegistration()
  }

  /** Delete superseded event dirs and their markers (never a compact
    * manifest itself). Safe at any time after the manifest exists.
    */
  private def gcReplacedDirs(): Unit = {
    val replaced = replacedTags()
    replaced.foreach { t =>
      try {
        fs.delete(new Path(p("events"), t), true)
        if (!t.startsWith("compact-")) fs.delete(new Path(p("commits"), t), false)
      } catch { case _: Throwable => () } // retried by the next call
    }
  }

  private def readEvents(includeTag: Option[String] = None): Dataset[Event] = {
    val committed = committedEventDirs(includeTag)
    if (committed.isEmpty) return spark.emptyDataset[Event]
    val raw = spark.read
      .parquet(committed.map(_.toString): _*)
      .withColumn("arrival", expr("shiftleft(bstamp, 40) + seq"))
    Ingest.prepare(raw)
  }

  /** The committed raw-event rows as a plain relation — the surface a
    * user scans for ad-hoc SQL over raw data. With [[enableQueryRewrite]]
    * on, full-stream aggregates over this frame silently re-plan onto
    * the summary table (clamping happens before persist, so `value`
    * aggregates agree exactly).
    */
  def rawEvents: org.apache.spark.sql.DataFrame = {
    val committed = committedEventDirs()
    // Empty-store schema matches the persisted one (Event + bstamp) so
    // schema-dependent callers behave identically before/after the
    // first commit.
    if (committed.isEmpty) spark.emptyDataset[Event].toDF().withColumn("bstamp", lit(0L))
    else spark.read.parquet(committed.map(_.toString): _*)
  }

  // ------------------------------------------------- query rewrite hookup

  private var rewriteEnabled = false
  private var rewriteKey: Option[Set[String]] = None

  /** Install graft.plans.SummaryRewrite for this session and keep this
    * store's committed-events -> current-summary pairing registered
    * across appends and landmark changes. After this, full-stream
    * aggregates over [[rawEvents]] read O(log N) summary rows instead
    * of the raw table.
    */
  def enableQueryRewrite(): Unit = {
    rewriteEnabled = true
    graft.plans.SummaryRewrite.install(spark)
    refreshRewriteRegistration()
  }

  private def refreshRewriteRegistration(): Unit = if (rewriteEnabled) {
    rewriteKey.foreach(graft.plans.SummaryRewrite.unregisterSet)
    rewriteKey = {
      // Landmark elements live in the landmarks table, NOT in
      // summary_windows — a full-stream aggregate over raw events is
      // only answerable from the summary when no landmarks exist.
      val dirs = committedEventDirs()
      currentVersion("summary_windows") match {
        case Some(sv) if dirs.nonEmpty && storedIntervals.isEmpty =>
          Some(graft.plans.SummaryRewrite.registerSet(dirs.map(_.toString), sv.toString))
        case _ => None
      }
    }
  }

  // -------------------------------------------- distinct sketch hookup

  private var distinctEnabled = false
  private var distinctKey: Option[Set[String]] = None

  /** Maintain a windowed HLL distinct-count table
    * ([[DistinctSummary]] schema) alongside the scalar summaries and
    * keep it paired for the distinct-count rewrite: with the
    * approximate flag on, `approx_count_distinct`/`count(DISTINCT
    * value)` over [[rawEvents]] read O(log N) sketch rows. Incremental:
    * appends union per-element sketches and re-coarsen
    * ([[Compactor.recoarsenDistinct]]) — no full-corpus recompute.
    */
  def enableDistinctSummaries(): Unit = withWriteLock {
    distinctEnabled = true
    graft.plans.SummaryRewrite.install(spark)
    rebuildDistinct()
    refreshDistinctRegistration()
  }

  /** Canonical sketch table from the committed WAL (plus the batch
    * being applied, on replay) — the recovery twin of
    * [[refreshSummaries]] for the distinct path.
    */
  private def rebuildDistinct(includeUncommittedTag: Option[String] = None): Unit =
    writeVersioned("distinct_sketches",
      DistinctSummary.summarizePerStream(readEvents(includeUncommittedTag), specOf)
        .write.mode(SaveMode.Overwrite).parquet(_))

  /** The current sketch table (empty schema-stable frame before any
    * data).
    */
  def distinctSketches: org.apache.spark.sql.DataFrame =
    currentVersion("distinct_sketches")
      .map(v => spark.read.parquet(v.toString))
      .getOrElse(DistinctSummary.summarizePerStream(spark.emptyDataset[Event], specOf))

  private def appendIncrementalDistinct(prepared: Dataset[Event]): Unit = {
    val old = distinctSketches.persist()
    try {
      val baseCounts = old.groupBy($"streamId").agg((max($"ce") + 1L).as("n"))
      val fine = prepared.toDF()
        .join(baseCounts.withColumnRenamed("n", "base"), Seq("streamId"), "left")
        .select($"streamId", $"ts", $"ts".as("te"),
          ($"seq" + coalesce($"base", lit(0L))).as("cs"),
          ($"seq" + coalesce($"base", lit(0L))).as("ce"), $"value")
        .groupBy($"streamId", $"ts", $"te", $"cs", $"ce")
        .agg(org.apache.spark.sql.functions
          .hll_sketch_agg(DistinctSummary.canonicalValue($"value"), lit(12)).as("sketch"))
        .select($"streamId", $"ts", $"te", $"cs", $"ce", $"sketch")
      // Same write-amplification knob as the scalar path: re-coarsen
      // only every mergeEvery-th append; in between, per-element fine
      // sketches persist as-is (sketch merge is a monoid, so the state
      // after the next merge is identical to always-merging).
      val next =
        if (mergeDue("distinct")) Compactor.recoarsenDistinct(old.unionByName(fine), specOf)
        else old.unionByName(fine)
      writeVersioned("distinct_sketches",
        next.write.mode(SaveMode.Overwrite).parquet(_))
    } finally old.unpersist()
  }

  // ------------------------------------------------ bloom/cms hookup

  private var freqEnabled = false

  /** Maintain a windowed bloom+cms table ([[FreqSummary]] schema)
    * alongside the scalar summaries — the reference's declared-but-
    * unimplemented bloom/cms window ops
    * (`/root/reference/protos/summarydb.capnp:6-13`). Range membership
    * ([[mightContain]]) and frequency ([[freqEstimate]]) then read
    * O(log N) sketch rows instead of raw events. Incremental: appends
    * union per-element sketches and re-coarsen on the [[mergeEvery]]
    * cadence — no full-corpus recompute.
    */
  def enableFreqSummaries(): Unit = withWriteLock {
    freqEnabled = true
    graft.plans.SummaryRewrite.install(spark)
    rebuildFreq()
    refreshFreqRegistration()
  }

  private var freqKey: Option[Set[String]] = None

  /** Keep the CMS count rewrite paired with the current freq table
    * version, mirroring [[refreshDistinctRegistration]].
    */
  private def refreshFreqRegistration(): Unit = if (freqEnabled) {
    freqKey.foreach(graft.plans.SummaryRewrite.unregisterFreqSet)
    freqKey = {
      val dirs = committedEventDirs()
      currentVersion("freq_sketches") match {
        case Some(sv) if dirs.nonEmpty =>
          Some(graft.plans.SummaryRewrite.registerFreqSet(dirs.map(_.toString), sv.toString))
        case _ => None
      }
    }
  }

  /** Canonical bloom/cms table from the committed WAL (plus the batch
    * being applied, on replay) — the recovery twin of
    * [[refreshSummaries]] for the freq path.
    */
  private def rebuildFreq(includeUncommittedTag: Option[String] = None): Unit =
    writeVersioned("freq_sketches",
      FreqSummary.summarizePerStream(readEvents(includeUncommittedTag), specOf)
        .write.mode(SaveMode.Overwrite).parquet(_))

  /** The current bloom/cms sketch table (empty schema-stable frame
    * before any data).
    */
  def freqSketches: org.apache.spark.sql.DataFrame =
    currentVersion("freq_sketches")
      .map(v => spark.read.parquet(v.toString))
      .getOrElse(FreqSummary.summarizePerStream(spark.emptyDataset[Event], specOf))

  private def appendIncrementalFreq(prepared: Dataset[Event]): Unit = {
    val old = freqSketches.persist()
    try {
      val baseCounts = old.groupBy($"streamId").agg((max($"ce") + 1L).as("n"))
      val rebased = prepared.toDF()
        .join(baseCounts.withColumnRenamed("n", "base"), Seq("streamId"), "left")
        .select($"streamId", $"ts",
          ($"seq" + coalesce($"base", lit(0L))).as("seq"), $"value")
      // The batch aggregates at the POST-APPEND canonical partition —
      // O(log n) sketch rows per stream, which nest into every later
      // partition. Per-element fine windows (the scalar/HLL path's
      // delta shape) would write one fixed-size ~16 KB bloom+cms pair
      // PER ELEMENT: bloom/cms have no sparse mode, so the delta must
      // be pre-aggregated.
      val newCounts = rebased.groupBy($"streamId").agg((max($"seq") + 1L).as("n"))
      val delta = FreqSummary.partialsAt(rebased, specOf, newCounts)
      val next =
        if (mergeDue("freq")) Compactor.recoarsenFreq(old.unionByName(delta), specOf)
        else old.unionByName(delta)
      writeVersioned("freq_sketches",
        next.write.mode(SaveMode.Overwrite).parquet(_))
    } finally old.unpersist()
  }

  // ------------------------------------------------ sample hookup

  private var sampleEnabled = false
  private var sampleK = SampleSummary.K

  /** Maintain a windowed bottom-k sample table ([[SampleSummary]]
    * schema) alongside the scalar summaries: "show me k events from
    * [t0, t1]" ([[sampleEvents]]) then reads O(log N) sample rows
    * instead of raw events. Bottom-k by the portable seq hash is an
    * EXACT monoid, so the incrementally maintained table is
    * bit-identical to a fresh build at every point. Incremental:
    * appends aggregate at the post-append canonical partition and
    * re-coarsen on the [[mergeEvery]] cadence.
    */
  def enableSampleSummaries(k: Int = SampleSummary.K): Unit = withWriteLock {
    sampleEnabled = true
    sampleK = k
    rebuildSample()
  }

  /** Canonical sample table from the committed WAL (plus the batch
    * being applied, on replay) — the recovery twin of
    * [[refreshSummaries]] for the sample path.
    */
  private def rebuildSample(includeUncommittedTag: Option[String] = None): Unit =
    writeVersioned("sample_windows",
      SampleSummary.summarizePerStream(readEvents(includeUncommittedTag), specOf, sampleK)
        .write.mode(SaveMode.Overwrite).parquet(_))

  /** The current sample table (empty schema-stable frame before any
    * data).
    */
  def sampleWindows: org.apache.spark.sql.DataFrame =
    currentVersion("sample_windows")
      .map(v => spark.read.parquet(v.toString))
      .getOrElse(SampleSummary.summarizePerStream(spark.emptyDataset[Event], specOf, sampleK))

  private def appendIncrementalSample(prepared: Dataset[Event]): Unit = {
    val old = sampleWindows.persist()
    try {
      val baseCounts = old.groupBy($"streamId").agg((max($"ce") + 1L).as("n"))
      val rebased = prepared.toDF()
        .join(baseCounts.withColumnRenamed("n", "base"), Seq("streamId"), "left")
        .select($"streamId", $"ts",
          ($"seq" + coalesce($"base", lit(0L))).as("seq"), $"value")
      // Aggregate at the POST-APPEND canonical partition (the freq
      // path's delta shape): O(log n) sample rows per stream, nesting
      // into every later partition. The hash key is of the GLOBAL
      // element index, so the incremental table samples identically to
      // a full rebuild.
      val newCounts = rebased.groupBy($"streamId").agg((max($"seq") + 1L).as("n"))
      val delta = SampleSummary.partialsAt(rebased, specOf, newCounts, sampleK)
      val next =
        if (mergeDue("sample")) Compactor.recoarsenSample(old.unionByName(delta), specOf, sampleK)
        else old.unionByName(delta)
      writeVersioned("sample_windows",
        next.write.mode(SaveMode.Overwrite).parquet(_))
    } finally old.unpersist()
  }

  // ------------------------------------------------ quantile hookup

  private var quantileEnabled = false
  private var quantileK = QuantileSummary.K

  /** Maintain a windowed KLL-style quantile table ([[QuantileSummary]]
    * schema) alongside the scalar summaries: "p50/p99 of [t0, t1]"
    * ([[rangeQuantiles]]) then reads O(log N) sketch rows instead of
    * raw events, with the sketch's self-certified rank-error bound
    * surviving every merge order. Incremental: appends aggregate at
    * the post-append canonical partition (the freq/sample delta shape)
    * and re-coarsen on the [[mergeEvery]] cadence.
    */
  def enableQuantileSummaries(k: Int = QuantileSummary.K): Unit = withWriteLock {
    quantileEnabled = true
    quantileK = k
    rebuildQuantile()
  }

  /** Canonical quantile table from the committed WAL (plus the batch
    * being applied, on replay) — the recovery twin of
    * [[refreshSummaries]] for the quantile path.
    */
  private def rebuildQuantile(includeUncommittedTag: Option[String] = None): Unit =
    writeVersioned("quantile_windows",
      QuantileSummary.summarizePerStream(readEvents(includeUncommittedTag), specOf, quantileK)
        .write.mode(SaveMode.Overwrite).parquet(_))

  /** The current quantile sketch table (empty schema-stable frame
    * before any data).
    */
  def quantileWindows: org.apache.spark.sql.DataFrame =
    currentVersion("quantile_windows")
      .map(v => spark.read.parquet(v.toString))
      .getOrElse(QuantileSummary.summarizePerStream(spark.emptyDataset[Event], specOf, quantileK))

  private def appendIncrementalQuantile(prepared: Dataset[Event]): Unit = {
    val old = quantileWindows.persist()
    try {
      val baseCounts = old.groupBy($"streamId").agg((max($"ce") + 1L).as("n"))
      val rebased = prepared.toDF()
        .join(baseCounts.withColumnRenamed("n", "base"), Seq("streamId"), "left")
        .select($"streamId", $"ts",
          ($"seq" + coalesce($"base", lit(0L))).as("seq"), $"value")
      // Aggregate at the POST-APPEND canonical partition, like the
      // freq/sample paths: O(log n) sketch rows per stream that nest
      // into every later partition; the KLL merge's error bounds add,
      // so the maintained table stays within its certified contract
      // whatever the merge history.
      val newCounts = rebased.groupBy($"streamId").agg((max($"seq") + 1L).as("n"))
      val delta = QuantileSummary.partialsAt(rebased, specOf, newCounts, quantileK)
      val next =
        if (mergeDue("quantile")) Compactor.recoarsenQuantile(old.unionByName(delta), specOf)
        else old.unionByName(delta)
      writeVersioned("quantile_windows",
        next.write.mode(SaveMode.Overwrite).parquet(_))
    } finally old.unpersist()
  }

  /** "p of [t0, t1]" per probe: (stream_id, p, est, rank_err, n) for
    * one stream — O(log N) sketch rows read, estimate is an actual
    * data value, rank_err the merged sketches' certified bound.
    */
  def rangeQuantiles(streamId: Long, probs: Seq[Double],
      t0: Long = Long.MinValue, t1: Long = Long.MaxValue): Seq[(Double, Double, Long, Long)] = {
    require(quantileEnabled, "call enableQuantileSummaries() first")
    requireDeclared(streamId, "quantile")
    QuantileSummary.rangeQuantiles(
        quantileWindows.filter($"streamId" === streamId), probs, t0, t1)
      .orderBy($"p")
      .select($"p", $"est", $"rank_err", $"n")
      .as[(Double, Double, Long, Long)]
      .collect().toSeq
  }

  /** "Show me up to k events from [t0, t1]" — union the overlapping
    * windows' samples and keep the bottom-k: an exact uniform sample of
    * the covered range (whole edge windows — the storage-resolution
    * semantics every range op shares). O(log N) sample rows read.
    * Returns (seq, value) ascending by the sample order.
    */
  def sampleEvents(streamId: Long, k: Int = SampleSummary.K,
      t0: Long = Long.MinValue, t1: Long = Long.MaxValue): Seq[(Long, Double)] = {
    require(sampleEnabled, "call enableSampleSummaries() first")
    requireDeclared(streamId, "sample")
    SampleSummary.rangeSample(
        sampleWindows.filter($"streamId" === streamId), math.min(k, sampleK), t0, t1)
      .orderBy($"rank")
      .select("seq", "value").as[(Long, Double)]
      .collect().toSeq
  }

  /** "Did `key` appear in stream `streamId` during [t0, t1]?" — union
    * the overlapping windows' blooms and probe: no false negatives
    * ever, false positives at the configured fpp. O(log N) sketch rows
    * read; the documented driver-returning twin of
    * [[FreqSummary.rangeMightContain]].
    */
  def mightContain(streamId: Long, key: String, t0: Long = Long.MinValue,
      t1: Long = Long.MaxValue): Boolean = {
    require(freqEnabled, "call enableFreqSummaries() first")
    requireDeclared(streamId, "bloom")
    FreqSummary.rangeMightContain(
        freqSketches.filter($"streamId" === streamId), Seq(key), t0, t1)
      .select("might_contain").as[Boolean]
      .collect().headOption.getOrElse(false)
  }

  /** "How often did `key` appear in [t0, t1]?" — union the overlapping
    * windows' CMS sketches and estimate: one-sided error,
    * `exact <= est <= exact + eps·N` at the configured confidence.
    */
  def freqEstimate(streamId: Long, key: String, t0: Long = Long.MinValue,
      t1: Long = Long.MaxValue): Long = {
    require(freqEnabled, "call enableFreqSummaries() first")
    requireDeclared(streamId, "cms")
    FreqSummary.rangeFreqEstimate(
        freqSketches.filter($"streamId" === streamId), Seq(key), t0, t1)
      .select("est_cnt").as[Long]
      .collect().headOption.getOrElse(0L)
  }

  /** Approximate heavy hitters of a stream over [t0, t1] — the
    * reference's declared `freq` op: MG candidates (guaranteed to hold
    * every key above N/(MgCapacity+1) of the range) scored by the
    * merged CMS. Returns up to k (key, est) pairs, descending.
    */
  def heavyHitters(streamId: Long, k: Int, t0: Long = Long.MinValue,
      t1: Long = Long.MaxValue): Seq[(String, Long)] = {
    require(freqEnabled, "call enableFreqSummaries() first")
    requireDeclared(streamId, "freq")
    FreqSummary.rangeHeavyHitters(
        freqSketches.filter($"streamId" === streamId), k, t0, t1)
      .orderBy($"rank")
      .select("key", "est_cnt").as[(String, Long)]
      .collect().toSeq
  }

  /** OpSet enforcement for the sketch surface, mirroring [[query]]
    * (`/root/reference/core/op_set.go:14-18`): a DECLARED stream only
    * answers its declared operators; undeclared streams answer all.
    */
  private def requireDeclared(streamId: Long, op: String): Unit =
    metas.get(streamId).foreach { m =>
      if (!m.operators.contains(op))
        throw new IllegalArgumentException(
          s"operator '$op' not declared for stream $streamId " +
            s"(declared: ${m.operators.mkString(", ")})")
    }

  private def refreshDistinctRegistration(): Unit = if (distinctEnabled) {
    distinctKey.foreach(graft.plans.SummaryRewrite.unregisterDistinctSet)
    distinctKey = {
      val dirs = committedEventDirs()
      currentVersion("distinct_sketches") match {
        case Some(sv) if dirs.nonEmpty =>
          Some(graft.plans.SummaryRewrite.registerDistinctSet(dirs.map(_.toString), sv.toString))
        case _ => None
      }
    }
  }

  def summaryWindows: Dataset[SummaryWindow] =
    readVersioned("summary_windows")(path => spark.read.parquet(path).as[SummaryWindow])(
      spark.emptyDataset[SummaryWindow])

  /** Declared spans of landmark windows that matched elements — one
    * bounded row per (stream, interval). */
  def landmarkSpans: Dataset[LandmarkSpan] =
    readVersioned("landmark_spans")(path => spark.read.parquet(path).as[LandmarkSpan])(
      spark.emptyDataset[LandmarkSpan])

  /** Exact landmark elements, one row each — the scale layout queries
    * aggregate over. */
  def landmarkElems: Dataset[LandmarkElem] =
    readVersioned("landmark_elems")(path => spark.read.parquet(path).as[LandmarkElem])(
      spark.emptyDataset[LandmarkElem])

  /** Driver-side landmark VIEW: elements assembled into one array per
    * window. Small-landmark convenience (tests, inspection) — queries
    * never build it; a wide-open landmark makes this one giant value,
    * which is exactly what the row tables above exist to avoid.
    */
  def landmarks: Dataset[LandmarkWindow] =
    Summarizer.assembleLandmarkWindows(landmarkSpans, landmarkElems)

  /** The reference's public query API
    * (`/root/reference/core/stream.go:156-192`). Streams declared via
    * [[newStream]] only answer their declared operators — an undeclared
    * op is an error, as in the reference's OpSet lookup
    * (`/root/reference/core/op_set.go:14-18`). Undeclared streams (data
    * ingested without a catalog entry) answer all ops.
    */
  def query(
      streamId: Long,
      op: String,
      t0: Long,
      t1: Long,
      params: QueryParams = QueryParams()): AggResult = {
    requireDeclared(streamId, op)
    QueryEngine.queryOne(
      summaryWindows, landmarkSpans, landmarkElems, streamId, op, t0, t1, params)
  }
}

object SummaryDB {
  /** Open an existing DB directory (or start an empty one).
    *
    * `mergeEvery` is the persistence-cadence knob mirroring the
    * reference's `windowsPerMerge` (`/root/reference/core/pipeline.go`
    * merge batching): decay re-coarsening runs only every `mergeEvery`-th
    * incremental append; in between, fresh batches persist as
    * per-element fine windows. Purely a write-amplification/latency
    * trade — window aggregates are monoids, so the state after the next
    * merge is identical to always-merging (CompactorSpec), and queries
    * over the lagged table stay correct (any nested partition of the
    * stream answers exactly; estimates only get tighter from finer
    * windows). Cadence restarts on reopen — it is not durable state.
    */
  def open(spark: SparkSession, dir: String, mergeEvery: Int = 1): SummaryDB =
    new SummaryDB(spark, dir, mergeEvery)

  /** Clear a stale `_writer.lock` left by a writer that died mid-call.
    * Operator intervention, deliberately explicit: verify the old
    * writer is actually dead first (the lock records its pid and
    * acquisition time). Returns true iff a lock was removed. The store
    * itself needs no repair — the versioned-swap protocol leaves only
    * complete table versions, and an uncommitted events batch is
    * skipped by readers and recovered by the next appendOnce replay.
    */
  def breakLock(spark: SparkSession, dir: String): Boolean = {
    val lock = new Path(s"$dir/_writer.lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(lock) && fs.delete(lock, false)
  }
}
