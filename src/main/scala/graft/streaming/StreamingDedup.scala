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

  /** Mirrors the batch `Dedup.normalizeText` =
    * `lower(trim(regexp_replace(text, '\\s+', ' ')))` step for step:
    * collapse Java-`\s` runs to one space (same regex class Spark's
    * `regexp_replace` uses), strip leading/trailing SPACES only (SQL
    * `trim` removes just `' '`; `String.trim` would also eat control
    * chars <= U+0020 and diverge), then lowercase with `Locale.ROOT`
    * (Spark's `lower()` is locale-independent; default-locale
    * `toLowerCase` breaks parity on e.g. Turkish-locale JVMs). Equality
    * with the batch column holds for inputs whose lowercase mapping is
    * locale-invariant — i.e. everything except the handful of code
    * points with special-cased SQL collation behavior.
    */
  def normalize(text: String): String = {
    val collapsed = text.replaceAll("\\s+", " ")
    var s = 0
    var e = collapsed.length
    while (s < e && collapsed.charAt(s) == ' ') s += 1
    while (e > s && collapsed.charAt(e - 1) == ' ') e -= 1
    collapsed.substring(s, e).toLowerCase(java.util.Locale.ROOT)
  }

  /** 128-bit fingerprint of normalized text (lowercase, collapsed
    * whitespace) — same normalization as the batch exactDedup.
    */
  def fingerprint(text: String): (Long, Long) = {
    val norm = normalize(text)
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
