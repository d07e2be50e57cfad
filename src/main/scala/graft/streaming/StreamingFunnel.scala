package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the streaming face of [[graft.ops.Funnel]]:
  * per-user conversion depth through an ordered step sequence within
  * a window anchored at the first step, maintained continuously as
  * events arrive.
  *
  * State per user is three longs (depth, t1, prev) — bounded by
  * construction, no event history. Each micro-batch's events fold in
  * event-time order against that state, so replaying any ts-ordered
  * batch split of the same events reproduces [[graft.ops.Funnel]]
  * exactly (the parity contract every streaming twin here carries;
  * out-of-order arrival ACROSS batches is the stream's inherent blind
  * spot — a step that arrives after a later step already advanced the
  * user cannot retro-fill, while the batch operator sees it).
  *
  * Output (update mode): one row per user per batch in which the
  * user's depth or anchor CHANGED — the continuously-updating
  * conversion table a dashboard reads.
  */
object StreamingFunnel {

  final case class FunnelEvent(userId: Long, ts: Long, step: String)

  /** Per-user funnel progress: steps completed and the anchor time. */
  final case class Progress(userId: Long, depth: Int, t1: Long)

  /** Per-user fold state (3 longs, bounded). Must be public: Spark's
    * generated state serializer (Janino) compiles against it and
    * cannot see a `private` nested class.
    */
  final case class St(depth: Int, t1: Long, prev: Long)

  /** Continuous funnel over a (possibly batched) event stream.
    * `steps` and `windowMicros` as in [[graft.ops.Funnel.funnel]].
    */
  def funnel(
      in: Dataset[FunnelEvent],
      steps: Seq[String],
      windowMicros: Long): Dataset[Progress] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size, s"bad steps: $steps")
    require(windowMicros > 0, s"window must be positive: $windowMicros")
    val spark = in.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val w = windowMicros
    in.groupByKey(_.userId)
      .flatMapGroupsWithState[St, Progress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, events: Iterator[FunnelEvent], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(0, Long.MinValue, Long.MinValue))
          val before = st
          // Event-time order within the batch; drop non-step events.
          val ordered = events.filter(e => stepIdx.contains(e.step)).toArray.sortBy(_.ts)
          ordered.foreach { e =>
            val i = stepIdx(e.step)
            if (st.depth == 0) {
              if (i == 0) st = St(1, e.ts, e.ts)
            } else if (i == st.depth && st.depth < steps.size &&
                e.ts > st.prev && e.ts <= st.t1 + w) {
              st = St(st.depth + 1, st.t1, e.ts)
            }
          }
          if (st == before) Iterator.empty
          else {
            state.update(st)
            Iterator(Progress(userId, st.depth, st.t1))
          }
      }
  }
}
