package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** The sketch operators the reference declares but never implements —
  * `OpType` lists bloom/cms/freq (`/root/reference/protos/summarydb.capnp:6-13`,
  * `README.md:27-28`) with no code behind them. Implemented here as
  * typed Aggregators over Spark's public sketch library
  * (`org.apache.spark.util.sketch`), so they run with partial+final
  * aggregation like every other op, and their states merge as monoids
  * (mergeInPlace) exactly like DataTable columns.
  *
  * Buffers hold the live sketch object (Kryo-encoded): `reduce` mutates
  * in place, serialization happens only at shuffle/spill boundaries —
  * not per row.
  */
object Sketches {

  private def bloomToBytes(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
  private def bloomFromBytes(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  private def cmsToBytes(s: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }
  private def cmsFromBytes(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(b))

  /** Bloom-filter membership aggregate over a string column. Output =
    * the filter's stable wire format; probe with [[mightContain]].
    */
  class BloomAggregator(expectedItems: Long = 10000L, fpp: Double = 0.01)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(bf: BloomFilter, a: String): BloomFilter = {
      if (a != null) bf.putString(a)
      bf
    }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    def finish(r: BloomFilter): Array[Byte] = bloomToBytes(r)
    def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Count-min-sketch aggregate over a string column. Output = the
    * sketch's stable wire format; probe with [[cmsEstimate]].
    */
  class CmsAggregator(eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42)
      extends Aggregator[String, CountMinSketch, Array[Byte]] {
    def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)
    def reduce(s: CountMinSketch, a: String): CountMinSketch = {
      if (a != null) s.addString(a)
      s
    }
    def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
      a.mergeInPlace(b); a
    }
    def finish(r: CountMinSketch): Array[Byte] = cmsToBytes(r)
    def bufferEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union of already-serialized Bloom filters (binary column) — the
    * merge half of the aggregate split out on its own, for re-coarsening
    * stored per-window sketches without touching raw values
    * (Compactor.recoarsenFreq). Buffer is the live filter with a lazy
    * null zero: `mergeInPlace` requires identical bit-array sizing, so
    * a parameterless zero cannot pre-allocate — all inputs must come
    * from one build configuration (enforced by FreqSummary's
    * table-level constants).
    */
  class BloomUnionAggregator extends Aggregator[Array[Byte], BloomFilter, Array[Byte]] {
    def zero: BloomFilter = null
    def reduce(b: BloomFilter, a: Array[Byte]): BloomFilter =
      if (a == null) b
      else if (b == null) bloomFromBytes(a)
      else { b.mergeInPlace(bloomFromBytes(a)); b }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
      if (a == null) b else if (b == null) a else { a.mergeInPlace(b); a }
    def finish(r: BloomFilter): Array[Byte] = if (r == null) null else bloomToBytes(r)
    def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union of serialized count-min sketches — CMS counters add
    * cell-wise under `mergeInPlace`, so the union of window sketches
    * equals the sketch of the concatenated windows (same monoid shape
    * as the scalar ops). Same lazy-null zero/compatibility contract as
    * [[BloomUnionAggregator]].
    */
  class CmsUnionAggregator extends Aggregator[Array[Byte], CountMinSketch, Array[Byte]] {
    def zero: CountMinSketch = null
    def reduce(b: CountMinSketch, a: Array[Byte]): CountMinSketch =
      if (a == null) b
      else if (b == null) cmsFromBytes(a)
      else { b.mergeInPlace(cmsFromBytes(a)); b }
    def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
      if (a == null) b else if (b == null) a else { a.mergeInPlace(b); a }
    def finish(r: CountMinSketch): Array[Byte] = if (r == null) null else cmsToBytes(r)
    def bufferEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `bloom_agg(col)` column for use inside `agg(...)`. */
  def bloomAgg(c: Column, expectedItems: Long = 10000L, fpp: Double = 0.01): Column =
    udaf(new BloomAggregator(expectedItems, fpp)).apply(c)

  /** `bloom_union_agg(col)` over serialized filters. */
  def bloomUnionAgg(c: Column): Column = udaf(new BloomUnionAggregator).apply(c)

  /** `cms_union_agg(col)` over serialized sketches. */
  def cmsUnionAgg(c: Column): Column = udaf(new CmsUnionAggregator).apply(c)

  /** `cms_agg(col)` column for use inside `agg(...)`. */
  def cmsAgg(c: Column, eps: Double = 0.001, confidence: Double = 0.99): Column =
    udaf(new CmsAggregator(eps, confidence)).apply(c)

  /** Driver/executor-side probes over serialized sketches. */
  def mightContain(bloomBytes: Array[Byte], item: String): Boolean =
    bloomFromBytes(bloomBytes).mightContainString(item)

  def cmsEstimate(cmsBytes: Array[Byte], item: String): Long =
    cmsFromBytes(cmsBytes).estimateCount(item)

  /** Probe many keys against one serialized sketch, deserializing the
    * sketch ONCE — `readFrom` copies the full ~eps-sized table, so a
    * per-key probe loop must not pay it per key.
    */
  def cmsEstimateAll(cmsBytes: Array[Byte], items: Seq[String]): Seq[(String, Long)] = {
    val s = cmsFromBytes(cmsBytes)
    items.map(k => (k, s.estimateCount(k)))
  }

  def mightContainAll(bloomBytes: Array[Byte], items: Seq[String]): Seq[(String, Boolean)] = {
    val bf = bloomFromBytes(bloomBytes)
    items.map(k => (k, bf.mightContainString(k)))
  }
}
