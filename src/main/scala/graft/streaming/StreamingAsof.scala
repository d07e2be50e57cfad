package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming face of
  * [[graft.ops.AsofJoin]]: probes (left rows) are answered with the
  * latest mark (right row) at or before their event time within the
  * same key, continuously, as both sides arrive on one tagged stream.
  *
  * This is the temporal-join pattern (Flink's "event-time temporal
  * join"): per-key state holds the recent mark history, each incoming
  * micro-batch is folded in event-time order against it, and history is
  * compacted to the newest `maxHistory` marks — bounded state by
  * construction, the knob trading memory for how far back a late probe
  * can still be answered exactly.
  *
  * Semantics match the batch operator row for row: inclusive `<=` (a
  * mark AT the probe's timestamp is visible to it), probes before every
  * mark get None — ASOF LEFT JOIN. Parity contract: replaying any
  * ts-ordered batch split of the same rows reproduces the batch join
  * exactly (marks that arrive AFTER a probe already answered in an
  * earlier micro-batch are the stream's inherent blind spot — the batch
  * operator sees them, a streaming operator cannot un-emit).
  *
  * Scale shape: state is sharded by key across executors like every
  * `flatMapGroupsWithState` operator; per-key cost is O(batch log batch)
  * for the sort plus a linear merge against O(maxHistory) state.
  */
object StreamingAsof {

  /** One tagged input row: `isMark = true` rows carry `value` (the
    * right side); probe rows carry `probeId` (the left side).
    */
  final case class AsofInput(
      key: Long, ts: Long, isMark: Boolean, probeId: Long, value: Double)

  final case class Enriched(
      key: Long, ts: Long, probeId: Long,
      asofTs: Option[Long], asofValue: Option[Double])

  /** Per-key mark history, ascending ts. Parallel arrays keep the state
    * row at 16 bytes/mark with no per-element boxing in the store.
    */
  final case class MarkHist(ts: Array[Long], vals: Array[Double])

  def mark(key: Long, ts: Long, value: Double): AsofInput =
    AsofInput(key, ts, isMark = true, probeId = -1L, value)

  def probe(key: Long, ts: Long, probeId: Long): AsofInput =
    AsofInput(key, ts, isMark = false, probeId, value = Double.NaN)

  /** Enrich the probe rows of `in` with the as-of mark. Append mode;
    * one output row per probe, none per mark.
    */
  def enrich(in: Dataset[AsofInput], maxHistory: Int = 1024): Dataset[Enriched] = {
    require(maxHistory >= 1, s"maxHistory must be positive: $maxHistory")
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[MarkHist, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[AsofInput], state: GroupState[MarkHist]) =>
          val hist = state.getOption.getOrElse(MarkHist(Array.empty, Array.empty))
          // Event-time order, marks before probes at equal ts (the batch
          // operator's `__isRight desc` tie rule), then probeId for a
          // total, deterministic order.
          val rows = it.toArray.sortBy(r => (r.ts, if (r.isMark) 0 else 1, r.probeId))
          val out = Vector.newBuilder[Enriched]
          val newTs = scala.collection.mutable.ArrayBuffer.empty[Long]
          val newVals = scala.collection.mutable.ArrayBuffer.empty[Double]
          var p = 0 // merge pointer into hist
          var curTs = Long.MinValue
          var curVal = 0.0
          var seen = false
          var i = 0
          while (i < rows.length) {
            val r = rows(i)
            // Advance history to <= r.ts. History is ascending, so the
            // last advanced entry is the max historical mark <= r.ts;
            // the >= guard keeps a LATE batch mark (older than the
            // newest historical mark already consumed) from regressing
            // the carry.
            while (p < hist.ts.length && hist.ts(p) <= r.ts) {
              if (hist.ts(p) >= curTs) { curTs = hist.ts(p); curVal = hist.vals(p); seen = true }
              p += 1
            }
            if (r.isMark) {
              if (r.ts >= curTs) { curTs = r.ts; curVal = r.value; seen = true }
              newTs += r.ts; newVals += r.value
            } else {
              out += Enriched(key, r.ts, r.probeId,
                if (seen) Some(curTs) else None,
                if (seen) Some(curVal) else None)
            }
            i += 1
          }
          // Merge history with the batch's marks (both ascending) and
          // keep only the newest maxHistory entries.
          val merged =
            (hist.ts.zip(hist.vals) ++ newTs.zip(newVals)).sortBy(_._1)
          val kept = merged.takeRight(maxHistory)
          state.update(MarkHist(kept.map(_._1), kept.map(_._2)))
          out.result().iterator
      }
  }
}
