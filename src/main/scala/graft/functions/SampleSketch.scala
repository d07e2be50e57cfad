package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** One retained sample element: the portable hash key that ranked it,
  * the element's per-stream sequence number (unique — the tie-break and
  * identity), and its value. Top-level so Spark derives a product
  * encoder with NAMED fields (`hk`, `seq`, `value`) — the sample column
  * is a real, inspectable `array<struct<...>>`, not an opaque blob.
  */
case class SampleItem(hk: Long, seq: Long, value: Double)

/** Deterministic bottom-k sample: the k elements whose portable Knuth
  * hash keys ([[graft.ops.Sampling.hashKey]]) sort first under
  * (hk asc, seq asc). Because the hash is a fixed function of the
  * element identity, bottom-k is EXACT under merge — the bottom-k of a
  * union is the bottom-k of the members' bottom-ks — so unlike the HLL/
  * bloom/CMS/KLL windowed sketches this one is a monoid with NO
  * approximation error: any merge tree (map-side combine, decay
  * re-coarsening, query-time range union) reproduces the global answer
  * bit-for-bit. That is the classic bottom-k / min-wise sample
  * (Cohen & Kaplan, PODC 2007); with a uniform hash it is a uniform
  * random sample of the window's elements, reproducible across engines.
  *
  * Buffer discipline: plain ArrayBuffer + sort-and-truncate once the
  * buffer doubles — amortized O(log k) per add, no heap structure for
  * Kryo's field serializer to corrupt (see the QSketch LongMap note).
  */
final class KSample(val k: Int) extends Serializable {
  require(k >= 1, s"sample size must be >= 1: $k")

  val buf: mutable.ArrayBuffer[SampleItem] = mutable.ArrayBuffer.empty

  private def compact(): Unit = if (buf.length > k) {
    val kept = buf.sortBy(x => (x.hk, x.seq)).take(k)
    buf.clear()
    buf ++= kept
  }

  def add(item: SampleItem): Unit = {
    buf += item
    if (buf.length >= 2 * k) compact()
  }

  def merge(other: KSample): Unit = {
    require(other.k == k, s"sample size mismatch: $k vs ${other.k}")
    buf ++= other.buf
    if (buf.length >= 2 * k) compact()
  }

  /** The final sample, sorted ascending by (hk, seq), length <= k. */
  def finish: Seq[SampleItem] = buf.sortBy(x => (x.hk, x.seq)).take(k).toSeq
}

object SampleSketch {

  /** Build a bottom-k sample from (hk, seq, value) rows. */
  class KsAggregator(k: Int) extends Aggregator[SampleItem, KSample, Seq[SampleItem]] {
    def zero: KSample = new KSample(k)
    def reduce(s: KSample, v: SampleItem): KSample = { s.add(v); s }
    def merge(a: KSample, b: KSample): KSample = { a.merge(b); a }
    def finish(r: KSample): Seq[SampleItem] = r.finish
    def bufferEncoder: Encoder[KSample] = Encoders.kryo[KSample]
    def outputEncoder: Encoder[Seq[SampleItem]] = ExpressionEncoder()
  }

  /** Union already-built samples (decay re-coarsening, range union):
    * bottom-k of the concatenation — exact, any merge order.
    */
  class KsUnionAggregator(k: Int)
      extends Aggregator[Seq[SampleItem], KSample, Seq[SampleItem]] {
    def zero: KSample = new KSample(k)
    def reduce(s: KSample, v: Seq[SampleItem]): KSample = {
      if (v != null) v.foreach(s.add)
      s
    }
    def merge(a: KSample, b: KSample): KSample = { a.merge(b); a }
    def finish(r: KSample): Seq[SampleItem] = r.finish
    def bufferEncoder: Encoder[KSample] = Encoders.kryo[KSample]
    def outputEncoder: Encoder[Seq[SampleItem]] = ExpressionEncoder()
  }

  private implicit val itemEnc: Encoder[SampleItem] = ExpressionEncoder()
  private implicit val seqEnc: Encoder[Seq[SampleItem]] = ExpressionEncoder()

  /** `ks_agg(hk, seq, value)` for use inside `agg(...)`. */
  def ksAgg(hk: Column, seq: Column, value: Column, k: Int): Column =
    udaf(new KsAggregator(k)).apply(hk, seq, value)

  /** `ks_union_agg(sample)` over `array<struct<hk, seq, value>>`. */
  def ksUnionAgg(sample: Column, k: Int): Column =
    udaf(new KsUnionAggregator(k)).apply(sample)
}
