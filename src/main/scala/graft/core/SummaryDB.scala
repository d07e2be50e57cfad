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
  *   dir/landmarks__vN          exact landmark windows
  *   dir/landmark_intervals__vN declared exact [t0,t1] spans
  *   dir/commits                batch-id markers for streaming replay
  *
  * Crash safety (the reference's atomic "brew" commits,
  * `/root/reference/storage/badger_backend.go:210-263`): every table
  * rewrite lands in a fresh `__v<stamp>` directory; readers resolve the
  * highest version that carries Spark's `_SUCCESS` marker, so a crash at
  * any point leaves a complete older or newer table — never a partial
  * one. Older versions are pruned best-effort after a successful write.
  */
final class SummaryDB private (val spark: SparkSession, dir: String) {
  import spark.implicits._

  private def p(name: String) = s"$dir/$name"

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

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

  /** Write a fresh version of `name`, then prune older versions. */
  private def writeVersioned(name: String, write: String => Unit): Unit = {
    val stamp = System.nanoTime()
    val target = p(s"${name}__v$stamp")
    write(target)
    // prune older complete/partial versions (best-effort)
    val prefix = name + "__v"
    fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .filter(s => s.getPath.getName.stripPrefix(prefix).toLong < stamp)
      .foreach(s => try fs.delete(s.getPath, true) catch { case _: Throwable => () })
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
  def newStream(meta: StreamMeta): Unit = {
    metas += meta.streamId -> meta
    writeVersioned("stream_meta",
      metas.values.toSeq.toDS().write.mode(SaveMode.Overwrite).parquet(_))
  }

  private def specOf: Long => WindowingSpec =
    sid => metas.getOrElse(sid, StreamMeta.exponential(sid, 2.0)).spec

  // ------------------------------------------------------------- intervals

  /** All landmark intervals ever declared (they are properties of the
    * DB's timeline, persisted so later appends keep honoring them).
    */
  def landmarkIntervals: Seq[(Long, Long)] =
    readVersioned("landmark_intervals")(path => spark.read.parquet(path).as[(Long, Long)])(
      spark.emptyDataset[(Long, Long)])
      .collect().toSeq.sorted

  private def saveIntervals(intervals: Seq[(Long, Long)]): Unit =
    writeVersioned("landmark_intervals",
      intervals.toDS().write.mode(SaveMode.Overwrite).parquet(_))

  // ---------------------------------------------------------------- append

  /** Append a batch of raw elements and refresh the summaries.
    * `landmarkIntervals` declares additional exact [t0, t1] spans; all
    * previously declared spans stay in force (they are persisted), so a
    * later plain append never un-landmarks data.
    *
    * Without any landmark intervals the append is INCREMENTAL: the
    * batch becomes per-element fine windows and the summary table
    * re-coarsens by monoid merge ([[Compactor]]) — raw events are
    * retained (WAL role) but never re-read to maintain decay. With
    * landmarks in force the summaries are recomputed from events (the
    * landmark split changes element ranks).
    */
  def append(
      events: Dataset[Event],
      landmarkIntervals: Seq[(Long, Long)] = Nil): Unit = {
    events.write.mode(SaveMode.Append).parquet(p("events"))
    val all = (this.landmarkIntervals ++ landmarkIntervals).distinct.sorted
    if (all.nonEmpty) {
      if (landmarkIntervals.nonEmpty) saveIntervals(all)
      refreshSummaries(all)
    } else appendIncremental(events)
  }

  /** Idempotent append keyed by a streaming micro-batch id: a batch id
    * that already committed is skipped, so checkpoint REPLAY of
    * committed batches cannot double-count. The residual window — a
    * crash after the data append but before the marker — remains
    * at-least-once (a transactional log, e.g. Delta, would close it).
    */
  def appendOnce(
      batchId: Long,
      events: Dataset[Event],
      landmarkIntervals: Seq[(Long, Long)] = Nil): Unit = {
    val marker = new Path(p("commits"), s"batch-$batchId")
    if (fs.exists(marker)) return
    append(events, landmarkIntervals)
    fs.mkdirs(new Path(p("commits")))
    fs.create(marker, true).close()
  }

  /** Old summary + fine windows of the new batch -> canonical partition
    * at the new N, by pure monoid re-merge. Batch timestamps are clamped
    * against each stream's stored time frontier with the reference's
    * monotonic repair (`core/pipeline.go:81-84`): an out-of-order
    * timestamp becomes lastTimestamp + 1, sequentially, so window time
    * spans stay ordered and range queries keep reference semantics.
    */
  private def appendIncremental(batch: Dataset[Event]): Unit = {
    val old = summaryWindows
    val baseInfo: Map[Long, (Long, Long)] = old
      .groupBy($"streamId")
      .agg((max($"ce") + 1L).as("n"), max($"te").as("lastTs"))
      .as[(Long, Long, Long)]
      .collect()
      .map { case (sid, n, lastTs) => sid -> ((n, lastTs)) }
      .toMap

    val prepared = Ingest.prepare(
      batch.toDF().withColumn("arrival", col("seq")),
      baseTs = baseInfo.map { case (k, v) => k -> v._2 })
    val fine = Compactor.fineWindows(prepared, baseInfo.map { case (k, v) => k -> v._1 })
    val merged = Compactor.recoarsen(old.unionByName(fine), specOf)
    writeVersioned("summary_windows",
      merged.toDF().write.mode(SaveMode.Overwrite).parquet(_))
  }

  /** Recompute summary + landmark tables from the persisted events. */
  private def refreshSummaries(intervals: Seq[(Long, Long)]): Unit = {
    val events = readEvents()
    val (sw, lw) =
      if (intervals.isEmpty)
        (Summarizer.summarizePerStream(events, specOf), spark.emptyDataset[LandmarkWindow])
      else {
        val pair = Summarizer.summarizeWithLandmarksPerStream(events, specOf, intervals)
        (pair._1, pair._2)
      }
    writeVersioned("summary_windows", sw.toDF().write.mode(SaveMode.Overwrite).parquet(_))
    writeVersioned("landmarks", lw.toDF().write.mode(SaveMode.Overwrite).parquet(_))
  }

  /** Re-rank the persisted events into dense per-stream order. The
    * stored per-batch seq is the tiebreak for equal timestamps — stable
    * across refreshes (monotonically_increasing_id would not be).
    */
  private def readEvents(): Dataset[Event] = {
    val raw = spark.read.parquet(p("events"))
      .withColumn("arrival", col("seq"))
    Ingest.prepare(raw)
  }

  def summaryWindows: Dataset[SummaryWindow] =
    readVersioned("summary_windows")(path => spark.read.parquet(path).as[SummaryWindow])(
      spark.emptyDataset[SummaryWindow])

  def landmarks: Dataset[LandmarkWindow] =
    readVersioned("landmarks")(path => spark.read.parquet(path).as[LandmarkWindow])(
      spark.emptyDataset[LandmarkWindow])

  /** The reference's public query API
    * (`/root/reference/core/stream.go:156-192`).
    */
  def query(
      streamId: Long,
      op: String,
      t0: Long,
      t1: Long,
      params: QueryParams = QueryParams()): AggResult =
    QueryEngine.queryOne(summaryWindows, landmarks, streamId, op, t0, t1, params)
}

object SummaryDB {
  /** Open an existing DB directory (or start an empty one). */
  def open(spark: SparkSession, dir: String): SummaryDB = new SummaryDB(spark, dir)
}
