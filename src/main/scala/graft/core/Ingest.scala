package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-stream preparation: monotonic-timestamp repair and element-rank
  * assignment.
  *
  * The reference forces timestamps monotonically non-decreasing at
  * append time — an out-of-order timestamp is rewritten to
  * `lastTimestamp + 1`, never re-sorted
  * (`/root/reference/core/pipeline.go:80-95`) — and numbers elements
  * with a per-stream counter (`numElements`).
  *
  * Ordering modes: the DEFAULT orders each stream by (ts, arrival)
  * before the clamp — out-of-order input is re-sorted rather than
  * clamped, which keeps the element order SQL-recomputable (an external
  * engine can sort by ts; it cannot cheaply replay the reference's
  * compounding lastTs+1 repair). `arrivalOrder = true` is the
  * reference-faithful mode (`/root/reference/core/pipeline.go:80-95`):
  * elements are processed strictly in arrival order and out-of-order
  * timestamps are bumped to lastTs+1 — bit-identical to the streaming
  * path `graft.streaming.StatefulClamp` (parity-tested on shuffled
  * input). The two modes agree exactly for in-order data.
  *
  * Scale: one hash shuffle on streamId + an in-partition sort; each
  * stream is processed by exactly one task (the fold is inherently
  * sequential, as in the reference's single writer thread). Streams are
  * the parallelism unit — fine for many medium streams; a single
  * pathological multi-TB stream would need a two-pass prefix-offset
  * scheme instead (documented trade-off, not needed at current scale).
  */
object Ingest {

  /** Columns: streamId (long), ts (long), value (double), plus an
    * arrival tiebreaker column. Produces Dataset[Event] with clamped ts
    * and dense 0-based seq per stream.
    *
    * `baseTs` seeds each stream's monotonic frontier (e.g. the stored
    * max te when appending a batch to an existing store): elements
    * earlier than the frontier are bumped to frontier+1, sequentially —
    * exactly the reference's repair.
    */
  def prepare(
      raw: DataFrame,
      streamCol: String = "streamId",
      tsCol: String = "ts",
      valueCol: String = "value",
      arrivalCol: String = "arrival",
      baseTs: Map[Long, Long] = Map.empty,
      arrivalOrder: Boolean = false): Dataset[Event] = {
    val spark = raw.sparkSession
    import spark.implicits._
    val bcBase = spark.sparkContext.broadcast(baseTs)
    val narrowed = raw.select(
      col(streamCol).cast("long").as("streamId"),
      col(tsCol).cast("long").as("ts"),
      col(valueCol).cast("double").as("value"),
      col(arrivalCol).cast("long").as("arrival"))
    val sortCols =
      if (arrivalOrder) Seq("streamId", "arrival") else Seq("streamId", "ts", "arrival")
    narrowed
      .repartition(col("streamId"))
      .sortWithinPartitions(sortCols.map(col): _*)
      .as[(Long, Long, Double, Long)]
      .mapPartitions { it =>
        var curStream = Long.MinValue
        var lastTs = Long.MinValue
        var seq = 0L
        it.map { case (streamId, ts, value, _) =>
          if (streamId != curStream) {
            curStream = streamId
            lastTs = bcBase.value.getOrElse(streamId, Long.MinValue)
            seq = 0L
          }
          val clamped = if (lastTs != Long.MinValue && ts < lastTs) lastTs + 1 else ts
          lastTs = clamped
          val e = Event(streamId, seq, clamped, value)
          seq += 1
          e
        }
      }
  }

  /** Testdata `events` table -> Event stream: streamId = user_id,
    * ts = event time in epoch micros, tiebreak on event_id.
    *
    * The testdata writes `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * only reads via the nanosAsLong legacy mode (as a LongType of
    * nanoseconds); micros = floorDiv(ns, 1000), matching DuckDB's
    * truncation when it reads the same column as TIMESTAMP.
    */
  def fromEventsTable(spark: SparkSession, sfDir: String): Dataset[Event] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    val tsMicros = df.schema("ts").dataType match {
      // Integral `div`, NOT floor(ts/1000): the double division loses
      // microsecond precision at epoch-nanos magnitude (ULP ~256 ns).
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _                                   => unix_micros(col("ts"))
    }
    val raw = df.select(
      col("user_id").as("streamId"),
      tsMicros.as("ts"),
      col("value"),
      col("event_id").as("arrival"))
    prepare(raw)
  }
}
