package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: sort data along an interleaved-bit
  * curve over SEVERAL columns so that parquet min/max statistics prune
  * files for predicates on ANY of them — the multi-column data-skipping
  * companion to [[BucketedLayout]] (a single-column sort clusters only
  * its own column; every other predicate scans every file).
  *
  * Mechanics (the standard lakehouse OPTIMIZE ZORDER BY shape):
  *   1. per column, compute ~2^bits approximate quantile boundaries
  *     (one pass, mergeable GK sketch — no global sort);
  *   2. map each value to its bucket index by binary search against the
  *     broadcast boundaries (rank-space normalization, so skew and
  *     scale differences between columns don't distort the curve);
  *   3. interleave the bucket bits into a Morton code;
  *   4. range-partition + sort by the code and write.
  *
  * The expensive step is the range exchange — same cost as any global
  * sort-write — but it runs ONCE at layout time; afterwards every
  * min/max-pruned scan on any Z column reads a fraction of the files.
  */
object ZOrder {

  /** Morton interleave of per-column bucket indices (`bits` bits each,
    * column 0 in the lowest-order positions). Total bits must fit a
    * long.
    */
  private[graft] def morton(idx: Array[Int], bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      var c = 0
      while (c < idx.length) {
        if (((idx(c) >> b) & 1) == 1) z |= 1L << (b * idx.length + c)
        c += 1
      }
      b += 1
    }
    z
  }

  /** Bucket index of `v` in `bounds` (ascending): count of boundaries
    * <= v, clamped to [0, 2^bits - 1]. Nulls sort first (bucket 0).
    */
  private[graft] def bucketOf(bounds: Array[Double], v: Double): Int =
    if (v.isNaN) bounds.length
    else {
      var lo = 0; var hi = bounds.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bounds(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo
    }

  /** The Morton-code column for `cols` at `bits` bits per column —
    * exposed for testing and for callers that want the code without
    * the write (e.g. range-partitioned streaming sinks).
    */
  def zColumn(df: DataFrame, cols: Seq[String], bits: Int = 12): Column = {
    require(cols.nonEmpty, "at least one z-order column")
    require(cols.length * bits <= 62, s"${cols.length} cols * $bits bits exceeds a long")
    val spark = df.sparkSession
    val nB = (1 << bits) - 1
    // Quantile boundaries per column in ONE pass (multi-column
    // approxQuantile); relativeError trades boundary precision against
    // sketch size — 1/(4*2^bits) keeps buckets near-equal-mass.
    val probes = (1 to nB).map(_.toDouble / (nB + 1)).toArray
    val doubled = cols.map(c => col(c).cast("double"))
    val tmp = df.select(doubled: _*).toDF(cols: _*)
    val bounds = tmp.stat.approxQuantile(cols.toArray, probes, 1.0 / (4.0 * (nB + 1)))
      .map(_.distinct.sorted)
    val bc = spark.sparkContext.broadcast(bounds)
    val z = udf { (vs: Seq[Double]) =>
      val bs = bc.value
      val idx = new Array[Int](vs.length)
      var i = 0
      while (i < vs.length) {
        // LEFT-ALIGN each column's bucket index to the common bit
        // width: a low-cardinality column (few distinct boundaries)
        // would otherwise park its significant bits at the BOTTOM of
        // the interleave and the curve's top bits — the ones that
        // decide file boundaries — would belong entirely to the
        // high-cardinality columns, giving zero pruning on the others.
        // Scaling idx by (nB+1)/effectiveBuckets puts every column's
        // MSB at the top of its lane.
        val eff = bs(i).length + 1
        val raw = math.min(bucketOf(bs(i), vs(i)), eff - 1)
        idx(i) = math.min((raw.toLong * (nB + 1) / eff).toInt, nB)
        i += 1
      }
      morton(idx, bits)
    }
    z(array(doubled.zip(cols).map { case (c, n) => coalesce(c, lit(Double.MinValue)) }: _*))
  }

  /** Write `df` z-ordered by `cols` into `nFiles` files at `dir`:
    * range-partition on the Morton code (near-equal file sizes), sort
    * within partitions, drop the code column. One exchange total.
    */
  def write(
      df: DataFrame,
      cols: Seq[String],
      dir: String,
      nFiles: Int,
      bits: Int = 12): Unit = {
    require(nFiles > 0, s"nFiles > 0: $nFiles")
    df.withColumn("__z", zColumn(df, cols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
