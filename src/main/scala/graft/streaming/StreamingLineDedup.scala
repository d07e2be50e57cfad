package graft.streaming

import graft.ops.LineDedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-batch line-level dedup: the batch [[LineDedup]] keep-one
  * removal lifted onto a document stream with parquet-backed line-key
  * state — the [[StreamingSubstringDedup]] pattern at line
  * granularity (line dedup is corpus-global, so it has no
  * stateful-operator form and belongs in a `foreachBatch` throughput
  * job).
  *
  * Per batch, a line occurrence is removed iff its trimmed-content
  * hash was seen in ANY earlier batch (its canonical copy already
  * streamed out), or an in-batch occurrence with a smaller (doc_id,
  * line_idx) exists. With arrival-ordered doc_ids this is EXACTLY the
  * batch keep-one rule at `minCount = 2` evaluated on the stream
  * prefix — the globally smallest occurrence is always the first
  * seen. Higher `minCount` thresholds need occurrence COUNTS in
  * state, not presence, and stay batch-only.
  *
  * State: one append-only parquet table of distinct line hashes per
  * batch under `stateDir/lk/batch=<id>` — 8 bytes per distinct line,
  * sharded by Spark, nothing driver-side. Retries are idempotent:
  * each batch overwrites its own subdir whole and reads pin the
  * explicit `< batchId` paths, so a retried batch never sees its own
  * half-written state.
  */
final class StreamingLineDedup(spark: SparkSession, stateDir: String) {
  import spark.implicits._

  private def fs =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statePaths(batchId: Long): Seq[String] = {
    val base = new Path(s"$stateDir/lk")
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .filter(s => s.getPath.getName.startsWith("batch=") &&
        s.getPath.getName.stripPrefix("batch=").toLong < batchId)
      .map(_.getPath.toString)
  }

  /** Clean one micro-batch (columns `doc_id`, `text`) against all
    * prior batches' line keys; returns (doc_id, clean_text) and
    * appends this batch's keys. Usable directly, or via [[sink]].
    */
  def cleanBatch(batch: DataFrame, batchId: Long): DataFrame = {
    // The line frame feeds the in-batch rank, the history join AND the
    // state append — materialize once.
    val l = LineDedup.lines(batch).localCheckpoint()
    val nonBlank = l.where(col("norm") =!= "")
    val paths = statePaths(batchId)
    val hist =
      if (paths.isEmpty) Seq.empty[Long].toDF("h")
      else spark.read.parquet(paths: _*)

    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("line_idx"))
    val inBatch = nonBlank
      .withColumn("rk", row_number().over(byKey))
      .filter(col("rk") > 1)
      .select(col("doc_id"), col("line_idx"))
    val crossBatch = nonBlank
      .join(hist.select(col("h")).distinct(), Seq("h"), "left_semi")
      .select(col("doc_id"), col("line_idx"))
    val drops = inBatch.unionByName(crossBatch).distinct()

    // Append state BEFORE the lazy rebuild runs its actions — its plan
    // pins the pre-batch paths, so it cannot see this write.
    nonBlank.select(col("h")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/lk/batch=$batchId")

    LineDedup.rebuildWithout(l, batch.select(col("doc_id").cast("long").as("doc_id")), drops)
  }

  /** `foreachBatch` adapter: clean each micro-batch and land the rows
    * under `outDir/batch=<id>` (overwrite = retry-safe). */
  def sink(outDir: String): (DataFrame, Long) => Unit = (df, batchId) =>
    cleanBatch(df, batchId)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
}
