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

  /** Exact most-frequent key per group (ties broken by key asc). */
  def topKeyExact(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val counts = df
      .groupBy(col(groupCol).as("group_id"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("group_id")).orderBy(col("cnt").desc, col("key"))
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("group_id"), col("key").as("top_key"), col("cnt").as("top_cnt"))
  }

  /** CMS-estimated counts of the candidate keys per group. Candidates
    * are the domain's distinct keys (collected once — heavy-hitter
    * candidates must come from a side channel at 100 TB; here the key
    * domain is small by construction). Estimates over-count by at most
    * eps*N with the configured confidence.
    */
  def heavyHittersCms(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      eps: Double = 0.001): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df.select(col(keyCol).cast("string")).distinct()
      .as[String].collect().sorted
    val bc = spark.sparkContext.broadcast(candidates)
    val sketches = df
      .groupBy(col(groupCol).as("group_id"))
      .agg(Sketches.cmsAgg(col(keyCol).cast("string"), eps).as("cms"))
    val probe = udf((cms: Array[Byte]) =>
      bc.value.map(k => (k, Sketches.cmsEstimate(cms, k))).toSeq)
    sketches
      .select(col("group_id"), explode(probe(col("cms"))).as("kv"))
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
      bc.value.map(k => (k, Sketches.mightContain(bloom, k))))
    blooms
      .select(col("group_id"), explode(probe(col("bloom"))).as("kv"))
      .select(col("group_id"), col("kv._1").as("key"), col("kv._2").as("might_contain"))
  }
}
