package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign documents to fixed-token-
  * budget training sequences ("packs"), the step that turns a filtered
  * corpus into equal-length model inputs. The layout is a pure function
  * of (doc ids, token counts, budget, shard count) — no RNG, no
  * partition-order dependence — so an external engine reproduces the
  * exact same pack assignment row by row.
  *
  * Model: docs are sharded by the portable [[Sampling.hashKey]]
  * (pseudo-uniform, id-derived), ordered by doc_id within the shard,
  * and laid head-to-tail; pack `p` of a shard owns token positions
  * [p*budget, (p+1)*budget). A doc belongs to the pack where it STARTS
  * (real pipelines split the straddling doc across the boundary; the
  * assignment of doc → starting pack is what this computes).
  *
  * Scale: one shuffle on the shard key, then a per-shard running sum
  * (window, doc_id order). Shards bound both the sort width and the
  * parallelism — size `nShards` ~ a few × the cluster's task slots so
  * each shard's running sum is an independent task; packs are globally
  * identified by (shard, pack_id), so no cross-shard coordination
  * exists at any scale.
  */
object Packing {

  /** (doc_id, shard, n_tokens, pack_id, pack_offset): `pack_id` is the
    * pack (within the shard) where the doc starts; `pack_offset` its
    * token position inside that pack. `tokenCol` must be a non-negative
    * integral token count already on the row (compute it with
    * [[TextAnalysis.tokenCount]] when starting from raw text).
    */
  def packSequences(
      docs: DataFrame,
      tokenCol: String,
      budget: Long,
      nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1: $budget")
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val shard = pmod(Sampling.hashKey(idCol), lit(nShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        shard.as("shard"),
        col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"),
        col("shard"),
        col("n_tokens"),
        // integral `div`, not `/`: double division loses exactness past
        // 2^53 total tokens per shard
        expr(s"prev div ${budget}L").as("pack_id"),
        pmod(col("prev"), lit(budget)).as("pack_offset"))
  }
}
