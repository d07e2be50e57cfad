package graft.core

import graft.functions.SampleSketch
import graft.ops.Sampling
import graft.windowing.{DecayModel, WindowingSpec}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Windowed sample summaries: each decay window carries a deterministic
  * bottom-k sample of its elements ([[graft.functions.KSample]]) — "show
  * me k representative events from [t0, t1]" answered from the decayed
  * windows at O(log N) rows read, without a raw scan. This is the
  * natural `sample` op alongside the reference's declared op set
  * (`/root/reference/protos/summarydb.capnp:6-13` stops at
  * count/sum/bloom/cms/max/freq): a time-decayed store that can say
  * "how many / how often" should also produce "show me a few".
  *
  * Unlike the HLL/bloom/CMS/KLL windowed sketches, bottom-k by a FIXED
  * portable hash ([[Sampling.hashKey]] of the element's per-stream seq)
  * is EXACT under merge — the bottom-k of a union is the bottom-k of
  * the members' bottom-ks — so:
  *
  *   - decay re-coarsening ([[Compactor.recoarsenSample]]) loses
  *     nothing: the coarse window's sample equals the sample that would
  *     have been drawn from the raw coarse window;
  *   - a full-range query equals the global bottom-k regardless of the
  *     merge history, which gives the op a HARD value-level oracle (any
  *     engine recomputes the identical k rows) rather than a bound
  *     contract;
  *   - with a uniform hash the k elements are a uniform sample of the
  *     range (bottom-k / min-wise sampling, Cohen & Kaplan, PODC 2007).
  *
  * Scale shape: one groupBy on the canonical partition; the aggregation
  * buffer is bounded at 2k items and combines map-side, so no window —
  * however large — materializes more than O(k) sample state anywhere.
  */
object SampleSummary {

  /** Default per-window sample size. */
  val K = 16

  /** Per-(stream, window) bottom-k samples over the canonical decay
    * partition — the [[QuantileSummary.summarizePerStream]] shape with
    * one sample column. Output (streamId, ts, te, cs, ce, sample) with
    * `sample: array<struct<hk, seq, value>>` sorted by (hk, seq).
    */
  def summarizePerStream(
      events: Dataset[Event],
      specOf: Long => WindowingSpec,
      k: Int = K,
      bufferSize: Long = 0L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val counts = events.groupBy($"streamId").agg(count(lit(1)).as("n"))
    partialsAt(events.toDF(), specOf, counts, k, bufferSize)
  }

  /** Sample partials of `events` on the canonical partition for the
    * per-stream counts in `counts` (streamId, n) — the incremental-
    * append shape ([[QuantileSummary.partialsAt]]).
    */
  private[graft] def partialsAt(
      events: DataFrame,
      specOf: Long => WindowingSpec,
      counts: DataFrame,
      k: Int = K,
      bufferSize: Long = 0L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val bs = bufferSize
    events
      .join(counts, "streamId")
      .withColumn("windowId",
        graft.functions.WindowId.column(specOf, bs, $"streamId", $"n", $"seq"))
      .withColumn("hk", Sampling.hashKey("seq"))
      .groupBy($"streamId", $"windowId")
      .agg(
        min($"ts").as("ts"),
        max($"ts").as("te"),
        min($"seq").as("cs"),
        max($"seq").as("ce"),
        SampleSketch.ksAgg($"hk", $"seq", $"value", k).as("sample"))
      .select($"streamId", $"ts", $"te", $"cs", $"ce", $"sample")
  }

  /** As [[summarizePerStream]] with one spec for every stream. */
  def summarize(
      events: Dataset[Event],
      spec: WindowingSpec,
      k: Int = K,
      bufferSize: Long = 0L): DataFrame =
    summarizePerStream(events, _ => spec, k, bufferSize)

  /** Per-stream bottom-k over the windows overlapping [t0, t1]:
    * (stream_id, rank, seq, value, hk), rank 1..k ascending by
    * (hk, seq). Over a range that partially overlaps edge windows the
    * sample covers the whole edge windows (windows are the storage
    * resolution — the sum estimator's proration semantics). Over the
    * full range this is EXACTLY the global per-stream bottom-k.
    */
  def rangeSample(
      samples: DataFrame,
      k: Int = K,
      t0: Long = Long.MinValue,
      t1: Long = Long.MaxValue): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .filter($"te" >= t0 && $"ts" <= t1)
      .groupBy($"streamId")
      .agg(SampleSketch.ksUnionAgg($"sample", k).as("sample"))
      .select($"streamId".as("stream_id"), posexplode($"sample").as(Seq("pos", "s")))
      .select($"stream_id", ($"pos" + 1L).as("rank"),
        $"s.seq".as("seq"), $"s.value".as("value"), $"s.hk".as("hk"))
  }

  /** Sample table routed THROUGH a real decay merge ([[QuantileSummary
    * .throughMerge]] shape): each stream's first half summarized at its
    * OWN canonical partition, the remainder at the final partition,
    * then one [[Compactor.recoarsenSample]] — every boundary that moved
    * between n/2 and n forces a genuine multi-way sample merge, and the
    * full-range result must STILL equal the global bottom-k exactly.
    */
  private[graft] def throughMerge(
      events: Dataset[Event],
      spec: WindowingSpec,
      k: Int = K): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val counts = events.groupBy($"streamId").agg(count(lit(1)).as("n"))
    val ev = events.toDF().join(counts, "streamId")
    val cols = Seq($"streamId", $"ts", $"seq", $"value")
    val firstHalf = ev.filter($"seq" < $"n" / 2).select(cols: _*)
    val rest = ev.filter($"seq" >= $"n" / 2).select(cols: _*)
    val specOf = (_: Long) => spec
    val a = partialsAt(firstHalf, specOf,
      firstHalf.groupBy($"streamId").agg(count(lit(1)).as("n")), k)
    val b = partialsAt(rest, specOf, counts, k)
    Compactor.recoarsenSample(a.unionByName(b), specOf, k)
  }
}
