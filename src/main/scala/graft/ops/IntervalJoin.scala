package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval join: facts with a point column joined to
  * intervals containing the point — WITHOUT the nested-loop plan Spark
  * gives a bare non-equi join (`BroadcastNestedLoopJoin`, the shape the
  * plan audit bans as O(N*M)).
  *
  * The classic bin-and-filter trick (Databricks' range-join hint, Flink
  * interval joins): pick a bucket width w, explode each interval into
  * its covered buckets (ceil(span/w) + 1 rows), map each fact to its
  * ONE bucket, equi-join on (keys..., bucket) — a plain shuffled hash
  * join — and re-check the exact predicate. A matching (fact, interval)
  * pair meets in exactly one bucket (the fact's), so no dedupe pass is
  * needed and output multiplicity is exact.
  *
  * Cost model: shuffle rows = facts + sum(ceil(span/w) + 1) interval
  * replicas; candidate pairs per bucket = facts_in_bucket x
  * intervals_covering_bucket. `bucketWidth` defaults to the MEDIAN
  * interval span (one approxQuantile action) — replicas ~2x intervals
  * while buckets stay selective. `maxBucketsPerInterval` fails loudly
  * on degenerate inputs (an unbounded interval exploding into millions
  * of rows) instead of silently materializing them.
  */
object IntervalJoin {

  /** Inner-join `facts` (point `tsCol`) with `intervals` (inclusive
    * [loCol, hiCol]), optionally equi-keyed on `keys` (columns present
    * in BOTH frames). Output: facts columns + the non-key interval
    * columns. Column sets (minus keys) must be disjoint.
    */
  def join(
      facts: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      loCol: String,
      hiCol: String,
      keys: Seq[String] = Nil,
      bucketWidth: Long = 0L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    val w =
      if (bucketWidth > 0) bucketWidth
      else {
        // p90 span, floored at 1: the MEDIAN is degenerate when most
        // intervals are points (single-event sessions have span 0 — a
        // width-1 bucket grid would explode real intervals into
        // billions of rows).
        val spans = intervals.select((col(hiCol) - col(loCol)).cast("double").as("s"))
        val q = spans.stat.approxQuantile("s", Array(0.9), 0.01)
        math.max(1L, q.headOption.getOrElse(1.0).toLong)
      }
    // The guard must live INSIDE the explode expression — a separate
    // checked column would be pruned away by the optimizer and never
    // evaluated. One degenerate interval fails the job loudly instead
    // of quietly materializing its bucket rows.
    val lo = floor(col(loCol) / w).cast("long")
    val hi = floor(col(hiCol) / w).cast("long")
    val ivals = intervals.withColumn("__bucket",
      explode(
        when(hi - lo + 1 > maxBucketsPerInterval,
          raise_error(concat(
            lit(s"IntervalJoin: interval spans more than $maxBucketsPerInterval buckets of width $w ("),
            col(loCol).cast("string"), lit(".."), col(hiCol).cast("string"),
            lit(") — raise bucketWidth or cap the interval"))))
          .otherwise(sequence(lo, hi))))
    val pts = facts.withColumn("__bucket", floor(col(tsCol) / w).cast("long"))
    pts
      .join(ivals, keys :+ "__bucket")
      .filter(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("__bucket")
  }
}
