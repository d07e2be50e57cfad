package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical table layout for shuffle-free joins and scan health at
  * 100 TB: bucketed tables and small-file compaction.
  *
  * The reference engine has no file formats at all (SURVEY §2.3 —
  * ingest/egress is its Append/Query API); on Spark the LAYOUT of the
  * parquet is a first-class performance surface:
  *
  *   - **Bucketing**: two tables bucketed by the same key into the same
  *     bucket count join WITHOUT an Exchange on either side — the scan
  *     itself reports `HashPartitioning`, so repeated joins (dedup
  *     verify kernels, pair-set joins against doc tables, fact-to-fact
  *     event joins) pay the shuffle ONCE at write time instead of once
  *     per query. At 100 TB a shuffle is the single most expensive plan
  *     node; bucketing is how you amortize it.
  *   - **Compaction**: streaming sinks and per-batch writers leave
  *     thousands of KB-sized files; scans then pay one task + one
  *     footer-read per file. Compaction rewrites a directory into
  *     target-sized files with an atomic swap (write-new + rename, the
  *     [[graft.core.SummaryDB]] writer pattern), so readers never see a
  *     partial state.
  */
object BucketedLayout {

  /** Write `df` as a bucketed external parquet table at `path`:
    * `nBuckets` buckets by `bucketCol`, each bucket sorted by
    * `sortCols` (defaults to the bucket key, which lets sort-merge
    * joins skip the per-partition sort too). The table registers in
    * the session catalog under `table` — on a cluster this is the
    * shared metastore entry; bucket metadata travels with it.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      nBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(nBuckets > 0, s"nBuckets > 0: $nBuckets")
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(bucketCol)
    df.write
      .mode(mode)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog — a bare `spark.read.parquet(path)` would NOT know the
    * bucketing and would shuffle again).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Rewrite a parquet directory into files of ~`targetBytes` each,
    * atomically: write to `<dir>.__compact_tmp`, then swap via rename.
    * Returns the file count after compaction. Row content is
    * preserved exactly (coalesce does not shuffle); only the file
    * layout changes.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): Long = {
    require(targetBytes > 0, s"targetBytes > 0: $targetBytes")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(path).filter { st =>
      st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
    }
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new org.apache.hadoop.fs.Path(dir + ".__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir + ".__compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    // coalesce (never repartition): narrow dependency, no shuffle — at
    // 100 TB compaction must be IO-bound, not shuffle-bound.
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Swap: current -> old, tmp -> current, drop old. Readers see the
    // old complete directory or the new complete directory, never a mix.
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compact: could not move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new java.io.IOException(s"compact: could not install $tmp")
    }
    fs.delete(old, true)
    fs.listStatus(path).count(st =>
      st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
  }
}
