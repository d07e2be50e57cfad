package graft.ops

import graft.functions.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency / distinct-count operators per group — the reference's
  * declared `freq` op surface plus approximate distinct counting.
  */
object Frequency {

  /** Exact per-group distinct count of `keyCol`. */
  def distinctExact(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(col(groupCol).as("group_id"))
      .agg(countDistinct(col(keyCol)).as("n_distinct"))

  /** Approximate per-group distinct count (HyperLogLog++, built-in). */
  def distinctApprox(df: DataFrame, groupCol: String, keyCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol).as("group_id"))
      .agg(approx_count_distinct(col(keyCol), rsd).as("n_distinct_approx"))

  /** Exact most-frequent key per group (ties broken by key asc). One
    * min_by aggregation over the per-(group, key) counts instead of a
    * rank window: map-side combine keeps a group with billions of
    * distinct keys off any single sort task.
    */
  def topKeyExact(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val counts = df
      .groupBy(col(groupCol).as("group_id"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .groupBy(col("group_id"))
      .agg(min_by(struct(col("key"), col("cnt")), struct(-col("cnt"), col("key"))).as("t"))
      .select(col("group_id"), col("t.key").as("top_key"), col("t.cnt").as("top_cnt"))
  }

  /** CMS-estimated counts of each group's heavy-hitter candidates.
    *
    * Candidate generation is fully distributed: every partition keeps a
    * bounded Misra-Gries summary per group (capacity 4*topK counters)
    * and emits its local top-K keys; the union of local candidates is
    * deduplicated and re-probed against the per-group CMS. Any key with
    * global frequency > N/(capacity+1) survives Misra-Gries in at least
    * the partition(s) carrying its mass, so true heavy hitters are never
    * lost, while memory is O(groups-per-task * capacity) regardless of
    * key cardinality — no driver-side collect of the key domain (a
    * high-cardinality key column at 100 TB would OOM the driver).
    *
    * `groupCol` must be integral (cast to long). Estimates over-count by
    * at most eps*N with the configured confidence.
    */
  def heavyHittersCms(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      eps: Double = 0.001,
      topK: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cap = 4 * topK

    val kv = df
      .select(col(groupCol).cast("long").as("g"), col(keyCol).cast("string").as("k"))
      .as[(Long, String)]
    val candidates = kv
      .mapPartitions { it =>
        val mg = collection.mutable.HashMap
          .empty[Long, collection.mutable.HashMap[String, Long]]
        it.foreach { case (g, k) =>
          val m = mg.getOrElseUpdate(g, collection.mutable.HashMap.empty)
          if (m.contains(k) || m.size < cap) m.update(k, m.getOrElse(k, 0L) + 1L)
          else {
            // Misra-Gries eviction: decrement all counters, drop zeros.
            m.mapValuesInPlace((_, c) => c - 1L)
            m.filterInPlace((_, c) => c > 0L)
          }
        }
        mg.iterator.flatMap { case (g, m) =>
          m.toSeq.sortBy { case (k, c) => (-c, k) }.take(topK)
            .map { case (k, _) => (g, k) }
        }
      }
      .toDF("group_id", "key")
      .distinct()

    val sketches = df
      .groupBy(col(groupCol).cast("long").as("group_id"))
      .agg(Sketches.cmsAgg(col(keyCol).cast("string"), eps).as("cms"))
    val candLists = candidates
      .groupBy(col("group_id"))
      .agg(collect_list(col("key")).as("cands"))
    val probe = udf((cms: Array[Byte], cands: Seq[String]) =>
      Sketches.cmsEstimateAll(cms, cands.sorted))
    sketches
      .join(candLists, "group_id")
      .select(col("group_id"), explode(probe(col("cms"), col("cands"))).as("kv"))
      .select(col("group_id"), col("kv._1").as("key"), col("kv._2").as("est_cnt"))
  }

  /** Per-group Bloom membership table: for each (group, candidate key),
    * whether the group's filter claims membership.
    */
  def bloomMembership(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      candidates: Seq[String],
      expectedItems: Long = 10000L): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(candidates)
    val blooms = df
      .groupBy(col(groupCol).as("group_id"))
      .agg(Sketches.bloomAgg(col(keyCol).cast("string"), expectedItems).as("bloom"))
    val probe = udf((bloom: Array[Byte]) =>
      Sketches.mightContainAll(bloom, bc.value))
    blooms
      .select(col("group_id"), explode(probe(col("bloom"))).as("kv"))
      .select(col("group_id"), col("kv._1").as("key"), col("kv._2").as("might_contain"))
  }
}
