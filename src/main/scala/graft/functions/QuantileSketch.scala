package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** Deterministic mergeable quantile sketch: KLL-style level compaction
  * (Karnin/Lang/Liberty, FOCS 2016) with the randomness removed — the
  * kept-offset alternates per level instead of being coin-flipped (the
  * Manku/Rajagopalan/Lindsay SIGMOD 1998 collapse discipline) — and a
  * SELF-CERTIFIED worst-case rank-error counter: every compaction of a
  * level of weight `w` perturbs the rank of any query point by at most
  * `w` (a point falls inside at most one dropped pair's value
  * interval), so `err += w` per compaction is a hard bound carried in
  * the sketch itself. Merging concatenates levels, ADDS the certified
  * bounds, then re-compacts — the bound survives arbitrary merge trees,
  * which makes the sketch a monoid like count/sum/max and lets decay
  * re-coarsening and query-time range union reuse the scalar shapes
  * (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Properties the contracts lean on:
  *   - every retained item is an ORIGINAL input value (compaction keeps
  *     subsets; nothing is interpolated), so a reported quantile always
  *     exists in the data;
  *   - a sketch holding <= k items at weight 1 is EXACT (err = 0) —
  *     small decay windows pay nothing for the approximation;
  *   - `err` is certified for any reduce/merge ORDER, so distributed
  *     aggregation (whose partition order varies run to run) cannot
  *     invalidate a bound-based oracle even though the retained item
  *     set itself may differ.
  *
  * Space: O(k · #levels) = O(k · log(n / k)) values per sketch.
  */
final class QSketch(val k: Int) extends Serializable {
  require(k >= 8, s"capacity too small to compact meaningfully: $k")

  /** weight -> retained values (unsorted between compactions).
    * Plain HashMap, NOT LongMap: the aggregation buffer rides Kryo's
    * field serializer, which corrupts LongMap's open-addressing
    * invariants (observed as a JVM crash in LongMap.foreach after a
    * shuffle round-trip); HashMap survives it, as the MG aggregator's
    * buffer already relies on.
    */
  val levels: mutable.HashMap[Long, mutable.ArrayBuffer[Double]] = mutable.HashMap.empty
  /** weight -> next kept-pair offset (deterministic alternation). */
  val flips: mutable.HashMap[Long, Boolean] = mutable.HashMap.empty
  /** Total weight (= number of ingested raw values). */
  var n: Long = 0L
  /** Certified worst-case absolute rank error of any rank estimate. */
  var err: Long = 0L

  def add(v: Double): Unit = {
    levels.getOrElseUpdate(1L, mutable.ArrayBuffer.empty) += v
    n += 1L
    compressFrom(1L)
  }

  /** Fold `other` into this sketch (both sides' guarantees add). */
  def merge(other: QSketch): Unit = {
    require(other.k == k, s"sketch capacity mismatch: $k vs ${other.k}")
    other.levels.foreach { case (w, buf) =>
      levels.getOrElseUpdate(w, mutable.ArrayBuffer.empty) ++= buf
    }
    n += other.n
    err += other.err
    levels.keys.toArray.sorted.foreach(compressFrom)
  }

  /** Compact the level at weight `w` if oversized; cascades upward
    * (2w, 4w, ...) because each compaction feeds the next level.
    */
  private def compressFrom(w0: Long): Unit = {
    var w = w0
    while (levels.get(w).exists(_.length > k)) {
      val buf = levels(w)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val keepSecond = flips.getOrElse(w, false)
      flips(w) = !keepSecond
      val off = if (keepSecond) 1 else 0
      val odd = arr.length % 2 == 1
      val up = levels.getOrElseUpdate(2L * w, mutable.ArrayBuffer.empty)
      // Pair value-adjacent items; keep one per pair at doubled weight.
      // An odd straggler (the LAST after sorting) stays at this level.
      var i = 0
      val pairs = arr.length / 2
      while (i < pairs) {
        up += arr(2 * i + off)
        i += 1
      }
      buf.clear()
      if (odd) buf += arr(arr.length - 1)
      err += w // hard bound: one dropped pair interval per query point
      w = 2L * w
    }
  }

  /** Estimated number of ingested values <= v (within `err` of exact). */
  def rankLe(v: Double): Long = {
    var r = 0L
    levels.foreach { case (w, buf) =>
      var i = 0
      while (i < buf.length) {
        if (buf(i) <= v) r += w
        i += 1
      }
    }
    r
  }

  /** The retained (value, weight) pairs, sorted by value. */
  def weighted: Array[(Double, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Double, Long)]
    levels.foreach { case (w, buf) => buf.foreach(v => out += ((v, w))) }
    out.sortBy(_._1).toArray
  }

  /** Smallest retained value whose estimated rank reaches ceil(p*n)
    * (1-based, clamped to [1, n]); the exact rank of the returned value
    * is within `err` of the target — see the contract derivation in
    * [[graft.core.QuantileSummary.quantileContract]].
    */
  def quantile(p: Double): Double = {
    require(n > 0, "empty sketch")
    val target = math.min(n, math.max(1L, math.ceil(p * n).toLong))
    val items = weighted
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    items(items.length - 1)._1
  }
}

object QuantileSketch {

  private val Magic = 0x51534b31 // "QSK1"

  def toBytes(s: QSketch): Array[Byte] = {
    val nVals = s.levels.valuesIterator.map(_.length).sum
    val buf = ByteBuffer.allocate(4 + 4 + 8 + 8 + 4 + s.levels.size * (8 + 1 + 4) + nVals * 8)
    buf.putInt(Magic).putInt(s.k).putLong(s.n).putLong(s.err).putInt(s.levels.size)
    s.levels.toArray.sortBy(_._1).foreach { case (w, vs) =>
      buf.putLong(w)
      buf.put(if (s.flips.getOrElse(w, false)) 1.toByte else 0.toByte)
      buf.putInt(vs.length)
      vs.foreach(buf.putDouble)
    }
    buf.array()
  }

  def fromBytes(b: Array[Byte]): QSketch = {
    val buf = ByteBuffer.wrap(b)
    require(buf.getInt() == Magic, "not a QSK1 sketch")
    val s = new QSketch(buf.getInt())
    s.n = buf.getLong()
    s.err = buf.getLong()
    val nl = buf.getInt()
    var i = 0
    while (i < nl) {
      val w = buf.getLong()
      val flip = buf.get() == 1.toByte
      val cnt = buf.getInt()
      val vs = mutable.ArrayBuffer.empty[Double]
      var j = 0
      while (j < cnt) { vs += buf.getDouble(); j += 1 }
      if (vs.nonEmpty) s.levels(w) = vs
      s.flips(w) = flip
      i += 1
    }
    s
  }

  /** Build a sketch from raw double values. */
  class QsAggregator(k: Int) extends Aggregator[Double, QSketch, Array[Byte]] {
    def zero: QSketch = new QSketch(k)
    def reduce(s: QSketch, v: Double): QSketch = { s.add(v); s }
    def merge(a: QSketch, b: QSketch): QSketch = { a.merge(b); a }
    def finish(r: QSketch): Array[Byte] = toBytes(r)
    def bufferEncoder: Encoder[QSketch] = Encoders.kryo[QSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union serialized sketches (range queries, re-coarsening). */
  class QsUnionAggregator extends Aggregator[Array[Byte], QSketch, Array[Byte]] {
    def zero: QSketch = null
    def reduce(s: QSketch, b: Array[Byte]): QSketch =
      if (b == null) s
      else if (s == null) fromBytes(b)
      else { s.merge(fromBytes(b)); s }
    def merge(a: QSketch, b: QSketch): QSketch =
      if (a == null) b else if (b == null) a else { a.merge(b); a }
    def finish(r: QSketch): Array[Byte] = if (r == null) null else toBytes(r)
    def bufferEncoder: Encoder[QSketch] = Encoders.kryo[QSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `qs_agg(col)` for use inside `agg(...)` over a double column. */
  def qsAgg(c: Column, k: Int): Column = udaf(new QsAggregator(k)).apply(c)

  /** `qs_union_agg(col)` over serialized sketches. */
  def qsUnionAgg(c: Column): Column = udaf(new QsUnionAggregator).apply(c)

  /** Probe many probabilities against one serialized sketch,
    * deserializing ONCE: (p, estimate, certified_err, n).
    */
  def quantilesAll(bytes: Array[Byte], probs: Seq[Double]): Seq[(Double, Double, Long, Long)] = {
    val s = fromBytes(bytes)
    probs.map(p => (p, s.quantile(p), s.err, s.n))
  }
}
