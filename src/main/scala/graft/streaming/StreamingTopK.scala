package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous per-group top-k keys — the streaming face of the
  * heavy-hitter path ([[graft.ops.Frequency.heavyHittersCms]]'s
  * Misra-Gries candidate stage, run as live state): a dashboard's
  * "top domains / top event types right now" table, maintained with
  * bounded state per group.
  *
  * State per group is one Misra-Gries summary: at most `capacity`
  * (key, count) counters plus one decrement total — O(capacity)
  * regardless of key cardinality, the same reason the batch candidate
  * stage scales. The fold is the textbook one (Misra & Gries 1982):
  * increment a held key, admit while below capacity, otherwise
  * decrement all and drop zeros. Every key with true frequency
  * > N/(capacity+1) is guaranteed held; a held counter undercounts
  * its true frequency by at most the group's decrement total, which
  * rides along as `max_over` (true count is within [cnt, cnt +
  * max_over]).
  *
  * Parity contract (the twin discipline): the fold is one-pass and
  * order-deterministic, so feeding ANY batch split of the same
  * arrival-ordered events reproduces a single batch fold exactly —
  * [[foldKernel]] is that shared kernel, and the spec runs it
  * driver-side as the reference.
  *
  * Output (update mode): whenever a batch changes a group's top-k
  * list (keys, order, or counts), the group's full current top-k is
  * re-emitted — rank 1..k by (count desc, key asc).
  */
object StreamingTopK {

  final case class KeyedEvent(groupId: Long, key: String)

  /** Misra-Gries state: held counters + total decrements. */
  final case class St(counts: Map[String, Long], decs: Long)

  final case class TopEntry(groupId: Long, rank: Int, key: String, cnt: Long, maxOver: Long)

  /** The one-pass Misra-Gries fold both the stream and the spec's
    * batch reference run: returns the updated (counts, decrements).
    */
  private[graft] def foldKernel(
      counts: collection.mutable.HashMap[String, Long],
      decsIn: Long,
      capacity: Int,
      keys: Iterator[String]): Long = {
    var decs = decsIn
    keys.foreach { k =>
      if (counts.contains(k) || counts.size < capacity)
        counts.update(k, counts.getOrElse(k, 0L) + 1L)
      else {
        counts.mapValuesInPlace((_, c) => c - 1L)
        counts.filterInPlace((_, c) => c > 0L)
        decs += 1L
      }
    }
    decs
  }

  private[graft] def topOf(st: St, k: Int): Seq[(String, Long)] =
    st.counts.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  /** Continuous top-k per group over a keyed event stream. */
  def topK(
      in: Dataset[KeyedEvent],
      k: Int,
      capacity: Int = 64): Dataset[TopEntry] = {
    require(k >= 1 && capacity >= k, s"need capacity >= k >= 1: $capacity, $k")
    val spark = in.sparkSession
    import spark.implicits._
    val kk = k; val cap = capacity
    in.groupByKey(_.groupId)
      .flatMapGroupsWithState[St, TopEntry](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (groupId: Long, events: Iterator[KeyedEvent], state: GroupState[St]) =>
          val st = state.getOption.getOrElse(St(Map.empty, 0L))
          val counts = collection.mutable.HashMap.from(st.counts)
          val before = topOf(st, kk)
          val decs = foldKernel(counts, st.decs, cap, events.map(_.key))
          val next = St(counts.toMap, decs)
          state.update(next)
          val top = topOf(next, kk)
          if (top == before) Iterator.empty
          else top.iterator.zipWithIndex.map { case ((key, c), i) =>
            TopEntry(groupId, i + 1, key, c, decs)
          }
      }
  }
}
