package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch exact deduplication for streams — the streaming face of
  * `ops/Dedup.exactDedup`: the first arrival of each normalized text
  * fingerprint passes through, every later duplicate (same batch or any
  * later batch) is dropped.
  *
  * State design for scale: the operator keys state by the 128-bit text
  * fingerprint (two longs), NOT the text — state size is O(distinct
  * docs · 16 bytes) regardless of document length, and the state store
  * shards it by key hash across executors. This is the standard
  * fingerprint-set streaming dedup (Spark's own `dropDuplicates` on a
  * stream keeps whole rows in state; keeping only the fingerprint is
  * the 100 TB version). No timeout by default: dedup is exact over the
  * stream's lifetime; pass a TTL through `withWatermarkedState` -style
  * wrappers if bounded state is required.
  */
object StreamingDedup {

  final case class Doc(docId: Long, text: String)
  final case class Seen(first: Long)

  /** 128-bit fingerprint of normalized text (lowercase, collapsed
    * whitespace) — same normalization as the batch exactDedup.
    */
  def fingerprint(text: String): (Long, Long) = {
    val norm = text.trim.toLowerCase.split("\\s+").mkString(" ")
    val bytes = norm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def h(seed: Int): Long =
      scala.util.hashing.MurmurHash3.bytesHash(bytes, seed).toLong & 0xFFFFFFFFL
    // Four independent 32-bit words -> full 128 bits (a sign-extended
    // half would silently cut collision resistance to 96 bits).
    ((h(0x9747b28c) << 32) | h(0xc2b2ae35), (h(0x85ebca6b) << 32) | h(0x27d4eb2f))
  }

  /** Emit only first arrivals. Within one micro-batch, ties break by
    * ascending docId (deterministic); across batches the earlier batch
    * wins (state remembers the first keeper).
    */
  def firstArrivals(docs: Dataset[Doc]): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(d => fingerprint(d.text))
      .flatMapGroupsWithState[Seen, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Long, Long), it: Iterator[Doc], state: GroupState[Seen]) =>
          if (state.exists) Iterator.empty
          else {
            val first = it.minBy(_.docId)
            state.update(Seen(first.docId))
            Iterator(first)
          }
      }
  }
}
