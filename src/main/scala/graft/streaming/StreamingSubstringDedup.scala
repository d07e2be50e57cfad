package graft.streaming

import graft.ops.SubstringDedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-batch exact substring dedup: the batch [[SubstringDedup]]
  * keep-one removal lifted onto a document stream with parquet-backed
  * window-key state (the [[StreamingCuration]] `foreachBatch` pattern —
  * substring dedup is corpus-global, so it has no stateful-operator
  * form and belongs in a throughput job).
  *
  * Per batch: a window occurrence is cut iff its key was seen in ANY
  * earlier batch (the canonical copy already streamed out), or an
  * in-batch occurrence with a smaller (doc_id, start) exists. With
  * arrival-ordered doc_ids this is EXACTLY the batch keep-one rule
  * evaluated on the stream prefix — the canonical (globally smallest)
  * occurrence is always the first seen — so streaming output equals
  * the batch pipeline run over the concatenated prefix
  * ([[graft.StreamingSubstringDedupSpec]] proves set parity on the
  * real corpus split into batches). The one semantic the prefix cannot
  * express is retroactive: the FIRST occurrence of a span whose
  * duplicate arrives in a later batch was already emitted intact —
  * which is precisely the batch rule's keep-one outcome for it.
  *
  * State: one append-only parquet table of distinct 64-bit window keys
  * per batch under `stateDir/wk/batch=<id>` — O(total tokens) rows of
  * one long, sharded by Spark, nothing driver-side. Retries are
  * idempotent: each batch overwrites its own `batch=<id>` subdir whole,
  * and reads pin the explicit subdir paths `< batchId`, so a retried
  * batch never sees its own half-written state.
  */
final class StreamingSubstringDedup(
    spark: SparkSession,
    stateDir: String,
    minTokens: Int = 50) {
  import spark.implicits._

  private def fs =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statePaths(batchId: Long): Seq[String] = {
    val base = new Path(s"$stateDir/wk")
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .filter(s => s.getPath.getName.startsWith("batch=") &&
        s.getPath.getName.stripPrefix("batch=").toLong < batchId)
      .map(_.getPath.toString)
  }

  /** Clean one micro-batch (columns `doc_id`, `text`) against all prior
    * batches' window keys; returns (doc_id, clean_text,
    * n_removed_tokens) and appends this batch's keys. Usable directly,
    * or via [[sink]] from `writeStream.foreachBatch`.
    */
  def cleanBatch(batch: DataFrame, batchId: Long): DataFrame = {
    // Fingerprints feed the in-batch rank, the history join AND the
    // state append — materialize once.
    val wins = SubstringDedup
      .windowFingerprints(batch, minTokens)
      .localCheckpoint()
    val paths = statePaths(batchId)
    val hist =
      if (paths.isEmpty) Seq.empty[Long].toDF("key")
      else spark.read.parquet(paths: _*)

    // In-batch non-canonical: everything after the smallest
    // (doc_id, start) of a key duplicated WITHIN the batch.
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("doc_id"), col("start"))
    val inBatch = wins
      .withColumn("rk", row_number().over(byKey))
      .filter(col("rk") > 1)
      .select(col("doc_id"), col("start"))
    // Cross-batch: ANY occurrence of a historically-seen key. Both
    // sides are hash-partitioned on the 8-byte key; the history side
    // is ids-only.
    val crossBatch = wins
      .join(hist.select(col("key")).distinct(), Seq("key"), "left_semi")
      .select(col("doc_id"), col("start"))
    val nonCanon = inBatch.unionByName(crossBatch).distinct()

    // Append this batch's keys BEFORE the lazy removal below runs its
    // actions — its plan pins the pre-batch paths, so it cannot see
    // this write.
    wins.select(col("key")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/wk/batch=$batchId")

    SubstringDedup.removeCovered(batch, nonCanon, minTokens)
  }

  /** `foreachBatch` adapter: clean each micro-batch and land the rows
    * under `outDir/batch=<id>` (overwrite = retry-safe).
    */
  def sink(outDir: String): (DataFrame, Long) => Unit = (df, batchId) =>
    cleanBatch(df, batchId)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
}
