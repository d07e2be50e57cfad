package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned equi-join: filter the BIG side of a join by a compact
  * Bloom filter of the small side's key set BEFORE the big side's
  * shuffle — the classic semi-join reduction of distributed query
  * engines (Bloom, CACM'70; runtime filters in Spark 3.3+/Trino/
  * Impala). Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) is off by
  * default and fires only when its creation-side plan criteria hold;
  * this operator is the explicit, always-available form for the
  * pipeline's dominant join shape: a 100 TB fact table joined to a
  * filtered dimension whose KEY SET fits in a few MB of bloom bits
  * even when its rows are too wide to broadcast-hash-join.
  *
  * Correctness: a Bloom filter has NO false negatives, so pruning
  * `big` to rows whose key might be in `small` never loses a matching
  * row; false positives pass extra rows that the exact join then
  * drops. The result therefore EQUALS the plain join for inner and
  * left-semi joins (the only types offered — an outer join's
  * null-extended rows would be lost by pruning).
  *
  * Scale shape: one pass over `small` builds the filter (map-side
  * partial blooms merged by `treeReduce`-style aggregation inside
  * Spark's `stat.bloomFilter`); the filter broadcasts O(bloom bytes);
  * the big side's scan → probe → shuffle pipeline then moves only
  * plausibly-matching rows. With a 1% fpp and a 0.1%-selectivity
  * dimension, the fact shuffle shrinks ~99% — the difference between
  * a cluster-wide spill and an in-memory exchange. Keys are probed as
  * `xxhash64` longs so any key type gets cheap 8-byte probes; a
  * 64-bit key-hash collision only ever ADDS a candidate row (false
  * positive), never removes one, so exactness is preserved.
  */
object BloomJoin {

  /** Bloom filter over `xxhash64(keyCol)` of `small` — built
    * distributed (per-partition partial filters, merged once), sized
    * by `expectedItems` (pass the known/estimated distinct count to
    * avoid the sizing `count()` action).
    */
  def keyFilter(
      small: DataFrame, keyCol: String,
      fpp: Double = 0.01, expectedItems: Long = -1L): BloomFilter = {
    val keys = small.select(xxhash64(col(keyCol)).as("k"))
    // Spark's stat.bloomFilter NPEs on zero input rows (null aggregate
    // buffer); an empty filter rejects everything, which is exactly the
    // empty-dimension semantics. The guard is a limit-1 probe in the
    // expectedItems fast path, a full count otherwise.
    val n = if (expectedItems > 0) { if (keys.isEmpty) 0L else expectedItems }
            else keys.count()
    if (n == 0) BloomFilter.create(1, fpp)
    else keys.stat.bloomFilter("k", n, fpp)
  }

  /** `big ⋈ small` on `bigKey == smallKey`, with the big side
    * bloom-pruned before its shuffle. `joinType` must be `inner` or
    * `left_semi`. The returned frame is row-identical to the unpruned
    * join.
    *
    * Broadcast lifetime: the filter's broadcast is captured by the
    * returned plan's probe UDF and lives until that plan is no longer
    * referenced (Spark's ContextCleaner reclaims it with the plan, not
    * before). One-shot jobs never notice; a long-running or per-batch
    * caller that builds many pruned joins should use
    * [[broadcastKeyFilter]] + [[pruneBroadcast]] and
    * `Broadcast.destroy()` each filter after materializing its join,
    * instead of accumulating executor-side broadcast blocks until GC.
    */
  def prunedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      joinType: String = "inner",
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom pruning preserves only inner/left_semi joins: $joinType")
    val bc = big.sparkSession.sparkContext
      .broadcast(keyFilter(small, smallKey, fpp, expectedItems))
    val pruned = pruneBroadcast(big, bigKey, bc)
    pruned.join(small, pruned(bigKey) === small(smallKey), joinType)
  }

  /** The pruned big side alone (no join) — for callers that feed the
    * survivors into a larger plan, and for measuring the reduction.
    * Same broadcast lifetime as [[prunedJoin]]; lifetime-sensitive
    * callers broadcast the filter themselves via [[broadcastKeyFilter]].
    */
  def prune(
      big: DataFrame, bigKey: String, bf: BloomFilter): DataFrame =
    pruneBroadcast(big, bigKey, big.sparkSession.sparkContext.broadcast(bf))

  /** [[keyFilter]] pre-broadcast, for callers that manage the
    * broadcast's lifetime: materialize every plan built over it, then
    * `destroy()` it — the per-batch discipline of a streaming job that
    * would otherwise pin one filter per micro-batch for the executor
    * lifetime.
    */
  def broadcastKeyFilter(
      small: DataFrame, keyCol: String,
      fpp: Double = 0.01, expectedItems: Long = -1L)
      : org.apache.spark.broadcast.Broadcast[BloomFilter] =
    small.sparkSession.sparkContext.broadcast(
      keyFilter(small, keyCol, fpp, expectedItems))

  /** [[prune]] over a caller-managed broadcast filter. The returned
    * plan is only valid until the caller destroys `bc`. */
  def pruneBroadcast(
      big: DataFrame, bigKey: String,
      bc: org.apache.spark.broadcast.Broadcast[BloomFilter]): DataFrame = {
    val probe = udf((h: Long) => bc.value.mightContainLong(h))
    big.where(probe(xxhash64(col(bigKey))))
  }

  /** Convenience for the measurement story: (rows in, rows after
    * pruning, exact matching rows) — `in >= pruned >= matched`, and
    * `pruned` close to `matched` is the filter doing its job. One
    * action per count; test/diagnostic surface, not a pipeline stage.
    */
  def pruneStats(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      fpp: Double = 0.01): (Long, Long, Long) = {
    val bf = keyFilter(small, smallKey, fpp)
    val in = big.count()
    val pruned = prune(big, bigKey, bf).count()
    val matched = big.join(small, big(bigKey) === small(smallKey), "left_semi").count()
    (in, pruned, matched)
  }
}
