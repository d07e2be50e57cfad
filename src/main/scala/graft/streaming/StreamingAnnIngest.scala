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
  * and a blind parquet append would duplicate its rows. Each batch is
  * therefore (1) STAGED under a per-attempt temp directory, (2) moved
  * into the cell directories under DETERMINISTIC per-batch file names
  * (`b<batchId>-<i>.parquet`, replacing any same-named leftover of a
  * partial earlier attempt), and (3) sealed with a marker
  * (`_stream_commits/<batchId>`); a re-delivered batchId with a
  * marker present is skipped. Deterministic names make step (2)
  * idempotent — a crash at ANY point leaves a retry that replaces
  * rather than duplicates, closing the append-then-mark crash window
  * a plain `parquet append` + marker recipe has. Even a zombie driver
  * racing a live one (both past the marker check) converges: both
  * write the same file names with the same batch content, the last
  * replace wins, and the marker is created with create-if-absent.
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
      // (1) stage under a per-attempt dir (UUID: a concurrent zombie
      // attempt must not write into the same staging tree)
      val staging = new org.apache.hadoop.fs.Path(indexDir,
        s"_stream_staging/$batchId-${java.util.UUID.randomUUID()}")
      graft.ops.AnnIndex.assignCells(spark, indexDir, batch, idCol, vecCol)
        .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
      // (2) move staged files under deterministic b<batchId>-<i> names
      // — replacing, never duplicating, what a partial earlier attempt
      // left behind
      val vectors = new org.apache.hadoop.fs.Path(indexDir, "vectors")
      fs.listStatus(staging)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
        .foreach { cd =>
          val cellDir = new org.apache.hadoop.fs.Path(vectors, cd.getPath.getName)
          fs.mkdirs(cellDir)
          // sweep this batch's leftovers first: a partial earlier
          // attempt may have installed MORE files here than this
          // attempt stages (task parallelism can differ across
          // retries); the touched-cell set itself is deterministic
          // (same replayed rows, frozen centers), so sweeping the
          // staged cells covers every earlier leftover
          val stale = fs.globStatus(
            new org.apache.hadoop.fs.Path(cellDir, s"b$batchId-*.parquet"))
          if (stale != null) stale.foreach(st => fs.delete(st.getPath, false))
          fs.listStatus(cd.getPath)
            .filter { st =>
              st.isFile && !st.getPath.getName.startsWith("_") &&
                !st.getPath.getName.startsWith(".")
            }
            .sortBy(_.getPath.getName)
            .zipWithIndex
            .foreach { case (st, i) =>
              val target = new org.apache.hadoop.fs.Path(cellDir, s"b$batchId-$i.parquet")
              fs.delete(target, false)
              if (!fs.rename(st.getPath, target))
                throw new java.io.IOException(
                  s"streaming ANN ingest: could not install ${st.getPath} as $target")
            }
        }
      fs.delete(staging, true)
      // (3) seal: create-if-absent — losing the race to a concurrent
      // identical attempt is fine, the files are name-deduplicated
      fs.mkdirs(commits)
      try {
        val out = fs.create(marker, false)
        out.close()
      } catch { case _: java.io.IOException => () }
      true
    }
  }
}
