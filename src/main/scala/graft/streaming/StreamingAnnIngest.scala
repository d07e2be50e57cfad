package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous vector ingestion into a persisted [[graft.ops.AnnIndex]]:
  * each micro-batch assigns against the frozen centers and appends to
  * the cell directories, so queries against the index see new vectors
  * within a trigger interval — the standard "nightly rebuild, live
  * append" serving loop.
  *
  * Retry discipline: `foreachBatch` re-runs a batch after a failure,
  * and a blind parquet append would duplicate its rows. Each batch
  * therefore commits a marker (`_stream_commits/<batchId>`, created
  * atomically through the index's FileSystem) AFTER its append; a
  * re-delivered batchId with a marker present is skipped. This is the
  * Spark-documented batchId-dedup recipe: exactly-once except for a
  * crash inside the append-then-mark window, where one batch can
  * duplicate — acceptable for ANN candidates (duplicates cost recall
  * nothing; they surface as repeated neighbor ids and collapse in any
  * downstream distinct) and called out here rather than hidden.
  */
object StreamingAnnIngest {

  /** Writer appending every micro-batch of `vectors` into the index at
    * `indexDir`. Caller sets checkpoint/trigger and starts it.
    */
  def intoIndex(
      vectors: DataFrame,
      indexDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataStreamWriter[Row] = {
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(indexDir, batch, batchId, idCol, vecCol)
      ()
    }
  }

  /** The guarded per-batch append the sink runs; returns true when the
    * batch was appended, false when its marker showed it already was.
    */
  private[graft] def appendBatch(
      indexDir: String,
      batch: DataFrame,
      batchId: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Boolean = {
    val spark = batch.sparkSession
    val commits = new org.apache.hadoop.fs.Path(indexDir, "_stream_commits")
    val marker = new org.apache.hadoop.fs.Path(commits, batchId.toString)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      graft.ops.AnnIndex.append(spark, indexDir, batch, idCol, vecCol)
      fs.mkdirs(commits)
      val out = fs.create(marker, true)
      try out.write(Array.emptyByteArray) finally out.close()
      true
    }
  }
}
