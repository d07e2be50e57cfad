package graft.core

import graft.windowing.WindowingSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The persistent multi-stream store: catalog + events + summary +
  * landmark tables under one directory — the Spark-native analogue of
  * the reference DB (`/root/reference/core/db.go:15-47`; stream metadata
  * per `protos/summarydb.capnp:47-54`).
  *
  * Layout (all Parquet):
  *   dir/stream_meta/       one row per declared stream
  *   dir/events/            raw appends (the reference's WAL role)
  *   dir/summary_windows/   the decayed materialized view
  *   dir/landmarks/         exact landmark windows
  *
  * Appends recompute the summaries of the affected streams from their
  * full event history — the deterministic (policy, N) -> partition
  * recomputation that replaces the reference's heap/RB-tree incremental
  * merger (SURVEY §7.0). Aggregates are monoids, so an incremental
  * fine-window + periodic re-coarsen compaction produces identical
  * tables; recomputation is the batch-simple form of the same design.
  */
final class SummaryDB private (val spark: SparkSession, dir: String) {
  import spark.implicits._

  private def p(name: String) = s"$dir/$name"

  private var metas: Map[Long, StreamMeta] = loadMetas()

  private def loadMetas(): Map[Long, StreamMeta] =
    if (exists("stream_meta"))
      spark.read.parquet(p("stream_meta")).as[StreamMeta].collect()
        .map(m => m.streamId -> m).toMap
    else Map.empty

  private def exists(name: String): Boolean = {
    val path = new Path(p(name))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path)
  }

  def streams: Map[Long, StreamMeta] = metas

  /** Declare a stream (operators + decay policy), as the reference's
    * `DB.NewStream` (`/root/reference/core/db.go:61-80`).
    */
  def newStream(meta: StreamMeta): Unit = {
    metas += meta.streamId -> meta
    metas.values.toSeq.toDS().write.mode(SaveMode.Overwrite).parquet(p("stream_meta"))
  }

  /** Append a batch of raw elements and refresh the summaries of the
    * streams the batch touches. `landmarkIntervals` marks [t0, t1] spans
    * (per append batch, applied to all touched streams) whose elements
    * are stored exactly instead of decayed — the batch form of
    * `StartLandmark`/`EndLandmark`.
    *
    * Without landmarks the append is INCREMENTAL: the batch becomes
    * per-element fine windows and the summary table re-coarsens by
    * monoid merge ([[Compactor]]) — raw events are retained (WAL role)
    * but never re-read to maintain decay. With landmarks in play the
    * summaries are recomputed from events (the landmark split changes
    * element ranks).
    */
  def append(
      events: Dataset[Event],
      landmarkIntervals: Seq[(Long, Long)] = Nil): Unit = {
    events.write.mode(SaveMode.Append).parquet(p("events"))
    if (landmarkIntervals.nonEmpty || landmarks.head(1).nonEmpty)
      refreshSummaries(landmarkIntervals)
    else
      appendIncremental(events)
  }

  private def specOf: Long => WindowingSpec =
    sid => metas.getOrElse(sid, StreamMeta.exponential(sid, 2.0)).spec

  /** Old summary + fine windows of the new batch -> canonical partition
    * at the new N, by pure monoid re-merge. Batch timestamps are clamped
    * to each stream's stored time frontier so window time spans stay
    * ordered (reference monotonic repair, `core/pipeline.go:81-84`).
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
    val bc = spark.sparkContext.broadcast(baseInfo)

    val prepared = Ingest.prepare(batch.toDF().withColumn("arrival", col("seq")))
      .map { e =>
        val lastTs = bc.value.get(e.streamId).map(_._2).getOrElse(Long.MinValue)
        if (e.ts < lastTs) e.copy(ts = lastTs) else e
      }
    val fine = Compactor.fineWindows(prepared, baseInfo.map { case (k, v) => k -> v._1 })
    val merged = Compactor.recoarsen(old.unionByName(fine), specOf)
    writeAtomic("summary_windows", merged.toDF().write.mode(SaveMode.Overwrite).parquet(_))
  }

  /** Recompute summary + landmark tables from the persisted events.
    * Writes to a fresh subdirectory then swaps — queries see either the
    * old or the new table, never a partial one (the reference's atomic
    * "brew" commits, `/root/reference/storage/badger_backend.go:210-263`).
    */
  private def refreshSummaries(landmarkIntervals: Seq[(Long, Long)]): Unit = {
    val events = readEvents()
    val (sw, lw) =
      if (landmarkIntervals.isEmpty)
        (Summarizer.summarizePerStream(events, specOf), spark.emptyDataset[LandmarkWindow])
      else {
        // Per-stream specs with landmark diversion: split once, then
        // summarize the regular remainder per stream.
        val pair = Summarizer.summarizeWithLandmarksPerStream(events, specOf, landmarkIntervals)
        (pair._1, pair._2)
      }
    writeAtomic("summary_windows", sw.toDF().write.mode(SaveMode.Overwrite).parquet(_))
    writeAtomic("landmarks", lw.toDF().write.mode(SaveMode.Overwrite).parquet(_))
  }

  private def writeAtomic(name: String, write: String => Unit): Unit = {
    val tmp = p(name + "__tmp")
    write(tmp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(p(name))
    fs.delete(dst, true)
    fs.rename(new Path(tmp), dst)
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
    if (exists("summary_windows")) spark.read.parquet(p("summary_windows")).as[SummaryWindow]
    else spark.emptyDataset[SummaryWindow]

  def landmarks: Dataset[LandmarkWindow] =
    if (exists("landmarks")) spark.read.parquet(p("landmarks")).as[LandmarkWindow]
    else spark.emptyDataset[LandmarkWindow]

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
