package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-guarded partition spreading for CPU-heavy passes over small
  * frames: a tiny corpus plans as one or two splits (parquet cannot
  * split inside a row group, and AQE coalesces small shuffles to ~one
  * partition), so a per-row-expensive downstream stage — sketch
  * updates, payload hashing — would serialize onto one task while the
  * rest of the cluster idles. The guard is the optimizer's SIZE
  * estimate (a frame past it — the at-scale case — is returned
  * untouched, so this is never a local-core-count constant baked into
  * a plan); a small frame that happens to be well-partitioned already
  * pays one tiny repartition, a deliberate trade for never executing
  * the plan to learn its partitioning.
  *
  * Only safe where the consumer is partition-invariant: exact monoids
  * (count/sum/min/max/bottom-k-by-hash), or sketches whose emitted
  * contract is certified for any merge order.
  */
private[graft] object Spread {
  /** Hard ceiling on the size guard: `defaultParallelism * 16 MB` grows
    * with the cluster, and on a 10k-core deployment that would read "a
    * 160 GB frame is tiny" and full-shuffle data that does not need it.
    * 1 GB is already far past any frame whose per-row work this helper
    * exists for.
    */
  private[graft] val MaxGuardBytes: Long = 1L << 30

  /** NEVER probes `df.rdd.getNumPartitions`: converting an
    * AQE-enabled plan to an RDD EXECUTES its shuffle stages to learn
    * the final partitioning — the probe itself would run the upstream
    * jobs once before the real consumer runs them again. The
    * optimizer's size estimate answers the only question asked here
    * ("is this frame tiny?") for free.
    */
  def ifNarrow(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val guard = math.min(want.toLong * (16L << 20), MaxGuardBytes)
    if (est < BigInt(guard)) df.repartition(want) else df
  }
}
