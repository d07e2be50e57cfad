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
  final case class TimedDoc(docId: Long, ts: java.sql.Timestamp, text: String)

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

  /** As [[firstArrivals]] but with BOUNDED state: a fingerprint whose
    * last arrival is older than `ttl` (event time, watermark-driven) is
    * evicted, so an infinite stream's state tracks its active working
    * set instead of growing forever. The trade is explicit: after
    * eviction the same text is admitted again — exact dedup within any
    * `ttl`-length window, best-effort beyond it. The TTL is sliding
    * (every arrival, duplicate or not, refreshes it), which keeps
    * hot boilerplate deduped indefinitely while cold fingerprints age
    * out. State per key stays 16 bytes + the timeout timestamp.
    *
    * `watermarkDelay` is the usual late-data tolerance and is applied
    * to `ts` here; rows later than the watermark are dropped by the
    * engine before reaching the dedup function.
    */
  def firstArrivalsWithTtl(
      docs: Dataset[TimedDoc],
      ttl: java.time.Duration,
      watermarkDelay: String = "0 seconds"): Dataset[TimedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ttlMs = ttl.toMillis
    require(ttlMs > 0, s"ttl must be positive: $ttl")
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(d => fingerprint(d.text))
      .flatMapGroupsWithState[Seen, TimedDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, Long), it: Iterator[TimedDoc], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove() // next arrival of this text re-admits
            Iterator.empty
          } else {
            val batch = it.toArray
            val out =
              if (state.exists) Iterator.empty
              else {
                val first = batch.minBy(_.docId)
                state.update(Seen(first.docId))
                Iterator.single(first)
              }
            // maxTs >= watermark (late rows were dropped) and ttl > 0,
            // so the timeout is always legally beyond the watermark.
            state.setTimeoutTimestamp(batch.map(_.ts.getTime).max + ttlMs)
            out
          }
      }
  }
}
