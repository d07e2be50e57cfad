package graft.core

import graft.windowing.{DecayModel, WindowingSpec}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Decay maintenance without raw events — the Spark replacement for the
  * reference's Merger (`/root/reference/core/merger.go:45-312`).
  *
  * Correctness rests on two facts:
  *   1. the merge process only ever coalesces ADJACENT windows
  *      (`core/merger.go:136-154`), so the canonical partition at any
  *      N' >= N, restricted to [0, N), is a coarsening of the partition
  *      at N — stored windows always nest into newer boundaries; and
  *   2. the per-window aggregates are commutative monoids
  *      (`core/op_set.go:50-60`), so re-merging window states loses
  *      nothing.
  *
  * Hence compaction = assign each stored window to the canonical window
  * containing its count-start, then one `groupBy.agg` re-merge. Runs
  * entirely on the summary table: at 100 TB the raw events are never
  * re-read to maintain decay.
  */
object Compactor {

  /** Re-coarsen `sw` to the canonical decay partition for each stream's
    * current element count (max ce + 1). Input windows may be any
    * partition that nests into the canonical one — in particular any
    * earlier canonical partition plus per-element fine windows of newly
    * appended data.
    */
  def recoarsen(
      sw: Dataset[SummaryWindow],
      specOf: Long => WindowingSpec,
      bufferSize: Long = 0L): Dataset[SummaryWindow] = {
    val spark = sw.sparkSession
    import spark.implicits._

    val counts: Array[(Long, Long)] = sw
      .groupBy($"streamId").agg((max($"ce") + 1L).as("n"))
      .as[(Long, Long)]
      .collect()
    val starts: Map[Long, Array[Long]] =
      counts.map { case (sid, n) => sid -> DecayModel.windowStarts(specOf(sid), n, bufferSize) }.toMap
    val bc = spark.sparkContext.broadcast(starts)
    val widOf = udf((sid: Long, cs: Long) => DecayModel.windowIdOf(bc.value(sid), cs))

    sw.toDF()
      .withColumn("windowId", widOf($"streamId", $"cs"))
      .groupBy($"streamId", $"windowId")
      .agg(
        min($"ts").as("ts"),
        max($"te").as("te"),
        min($"cs").as("cs"),
        max($"ce").as("ce"),
        sum($"count").as("count"),
        sum($"sum").as("sum"),
        max($"max").as("max"),
        min($"min").as("min"))
      .select($"streamId", $"ts", $"te", $"cs", $"ce", $"count", $"sum", $"max", $"min")
      .as[SummaryWindow]
  }

  /** Per-element fine windows for a freshly appended batch, offset by
    * each stream's existing element count — the unbuffered ingest shape
    * (`/root/reference/core/pipeline.go:109-117`) ready for
    * [[recoarsen]].
    */
  def fineWindows(
      batch: Dataset[Event],
      baseCount: Map[Long, Long]): Dataset[SummaryWindow] = {
    val spark = batch.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(baseCount)
    batch.map { e =>
      val base = bc.value.getOrElse(e.streamId, 0L)
      SummaryWindow(
        streamId = e.streamId,
        ts = e.ts, te = e.ts,
        cs = base + e.seq, ce = base + e.seq,
        count = 1.0, sum = e.value, max = e.value, min = e.value)
    }
  }
}
