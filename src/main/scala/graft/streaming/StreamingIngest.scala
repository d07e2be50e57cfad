package graft.streaming

import graft.core.{Event, SummaryDB}
import org.apache.spark.sql.{Dataset, ForeachWriter}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingest into a SummaryDB.
  *
  * The reference pipeline (ingester -> summarizer -> writer -> merger
  * goroutines, `/root/reference/core/pipeline.go:17-78`) maps to a
  * streaming query: each micro-batch is an append, and the decay
  * maintenance that the reference does incrementally (merge heap) is the
  * deterministic re-coarsening SummaryDB.append already performs —
  * aggregates are monoids, so re-coarsening at batch cadence reproduces
  * the reference's state at flush points (SURVEY §7.0).
  *
  * Recovery: the checkpoint plays the WAL's role
  * (`/root/reference/core/pipeline.go:266-335`). Each micro-batch
  * commits through `SummaryDB.appendOnce(batchId, ...)`, so checkpoint
  * REPLAY of an already-committed batch is a no-op. The residual
  * at-least-once window (crash after the data append but before the
  * batch marker) is documented on appendOnce.
  */
object StreamingIngest {

  /** Start appending a streaming Dataset[Event] into `db`. Caller owns
    * the query lifecycle (`processAllAvailable`, `stop`).
    */
  def start(
      events: Dataset[Event],
      db: SummaryDB,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Event], batchId: Long) =>
        db.appendOnce(batchId, batch)
      }
      .start()
}
