package graft.streaming

import graft.ops.{Contamination, Curation, Dedup, Sampling}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-batch corpus curation: the batch [[Curation]] pipeline lifted
  * onto an infinite stream of documents, applied per micro-batch
  * against parquet-backed state (a `foreachBatch` pattern, not a
  * stateful-operator chain — the near-dedup stage's pairwise joins have
  * no streaming-operator form, and a crawl-curation pipeline is a
  * throughput job, not a low-latency one).
  *
  * Stages per batch, sharing the batch kernels verbatim:
  *   1. row filters + PII scrub      — [[Curation.rowStages]] (stateless)
  *   2. exact dedup                  — in-batch min-id, then anti-join
  *                                     the normalized-text-hash state
  *   3. near-dedup                   — LSH candidates in-batch AND
  *                                     against the state's band-bucket
  *                                     index, shingle-verified, then
  *                                     connected components with the
  *                                     history contracted to one node
  *   4. decontamination (optional)   — stateless broadcast semi-join
  *   5. mixture sampling             — deterministic per-doc hash
  *
  * (Sequence packing is deliberately absent: bin state is a property of
  * the FINAL corpus — pack once downstream, on the curated output.)
  *
  * Semantics — streaming-prefix transitive closure: a document is
  * dropped iff, in the near-dup graph over every document seen up to
  * and including ITS OWN micro-batch, its component contains an
  * earlier-batch document or a smaller-id batchmate. This is the batch
  * pipeline's min-id-representative rule evaluated on the stream
  * prefix; the two agree exactly whenever clusters form around an
  * earlier member (the template-then-copies shape real near-dup
  * clusters have), and can differ only when a LATER document first
  * bridges two previously-unconnected earlier ones — evidence a
  * streaming pass cannot act on retroactively (the earlier docs were
  * already emitted).
  *
  * Scale/state design: state is three append-only parquet tables under
  * `stateDir`, partitioned by batch — `fp` (16-byte normalized-text
  * hashes), `bands` (the LSH band-bucket index: 16 rows/doc), `sh`
  * (sorted 64-bit shingle fingerprints/doc). All three are O(corpus)
  * like the batch pipeline's own intermediates, sharded by Spark —
  * nothing driver-side. Cross-batch candidate buckets are capped at
  * `maxBucket` (earliest ids win, deterministically), mirroring
  * [[Dedup.lshCandidatePairs]]'s in-batch cap. Batch re-delivery is
  * idempotent: each batch's state lands in `batch=<id>` subdirs
  * (re-written whole on retry) and reads pin the explicit subdir paths
  * `< batchId`, so a retried batch never sees its own half-written
  * state.
  */
final class StreamingCuration(
    spark: SparkSession,
    stateDir: String,
    cfg: Curation.Config = Curation.Config(),
    benchmark: Option[DataFrame] = None,
    maxBucket: Int = 64) {
  import spark.implicits._

  private def fs =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Explicit state subdir paths for batches strictly before `batchId`
    * — path-pinning is what makes retries idempotent (see class doc).
    */
  private def statePaths(name: String, batchId: Long): Seq[String] = {
    val base = new Path(s"$stateDir/$name")
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .filter(s => s.getPath.getName.startsWith("batch=") &&
        s.getPath.getName.stripPrefix("batch=").toLong < batchId)
      .map(_.getPath.toString)
  }

  private def readState(name: String, batchId: Long, empty: => DataFrame): DataFrame = {
    val paths = statePaths(name, batchId)
    if (paths.isEmpty) empty else spark.read.parquet(paths: _*)
  }

  /** Curate one micro-batch (columns doc_id, text, source; doc_ids must
    * be >= 0 and fresh per batch) against all prior batches' state;
    * returns the surviving scrubbed documents and appends this batch's
    * state. Usable directly, or via [[sink]] from
    * `writeStream.foreachBatch`.
    */
  // Cross-batch line dedup (optional stage 0): the batch pipeline's
  // keep-one rule at minCount=2 via [[StreamingLineDedup]]'s
  // presence state. Higher thresholds need occurrence counts in
  // state and stay batch-only.
  private lazy val lineDedup: Option[StreamingLineDedup] =
    cfg.lineDedupMinCount.map { m =>
      require(m == 2,
        s"streaming line dedup supports minCount=2 only (presence state): $m")
      new StreamingLineDedup(spark, s"$stateDir/line")
    }

  def curateBatch(batch: DataFrame, batchId: Long): DataFrame = {
    val raw = batch.select(col("doc_id"), col("text"), col("source"))

    // 0. Line dedup (optional) — a transform, document set unchanged.
    val input = lineDedup match {
      case Some(ld) =>
        raw.drop("text").join(
          ld.cleanBatch(raw, batchId).withColumnRenamed("clean_text", "text"),
          "doc_id")
      case None => raw
    }

    // 1. Stateless row stages — the batch pipeline's own code.
    val scrubbed = Curation.rowStages(input, cfg)

    // 2. Exact dedup: min-id per normalized-text hash in-batch, then
    // drop anything history has seen. (An in-batch duplicate of a
    // historical text carries the keeper's hash, so one anti-join
    // covers both cases.)
    val withHash = scrubbed.withColumn("text_hash", md5(Dedup.normalizeText(col("text"))))
    val keepInBatch = withHash.groupBy("text_hash").agg(min(col("doc_id")).as("keep_id"))
    val exact = withHash
      .join(keepInBatch, "text_hash")
      .filter(col("doc_id") === col("keep_id")).drop("keep_id")
      .join(readState("fp", batchId, Seq.empty[String].toDF("text_hash")),
        Seq("text_hash"), "left_anti")
      // Eager cut: exact feeds shingling, the band index, the survivor
      // anti-join AND the state appends — materialize once; blocks are
      // freed when the frame is GC'd.
      .localCheckpoint()

    // 3. Near-dedup. In-batch edges: the standard LSH->verify pipeline.
    val sh = Dedup.shingles(exact).localCheckpoint()
    val sigs = Dedup.minhashSignatures(exact)
    val inEdges = Dedup
      .verifyWithShingles(
        Dedup.lshCandidatePairs(sigs, maxBucket), sh, cfg.nearDupThreshold)
      .select(col("doc_a"), col("doc_b"))
    // Cross edges: new band rows join the historical bucket index;
    // per-bucket membership capped at the EARLIEST maxBucket ids (ids
    // are arrival-ordered) so a degenerate hot bucket stays linear.
    val newBands = Dedup.bandBuckets(sigs)
    val stateBands = readState("bands", batchId,
      Seq.empty[(Long, Int, Int)].toDF("doc_id", "band", "bucket"))
    val cappedBuckets = stateBands
      .groupBy(col("band"), col("bucket"))
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, maxBucket).as("ids"))
    val crossCands = newBands
      .join(cappedBuckets, Seq("band", "bucket"))
      .select(col("doc_id").as("doc_a"), explode(col("ids")).as("doc_b"))
      .distinct()
    val stateSh = readState("sh", batchId,
      Seq.empty[(Long, Array[Long])].toDF("doc_id", "shh"))
    val crossEdges = Dedup
      .verifyWithShingles(crossCands, sh.select(col("doc_id"), col("shh")).unionByName(stateSh),
        cfg.nearDupThreshold)
      .select(col("doc_a"), col("doc_b"))
    // Components over (in-batch edges + history contracted to the
    // virtual node -1): a doc survives near-dedup iff its component
    // touches no earlier doc and it is the min id among batchmates —
    // i.e. its representative is itself.
    val histEdges = crossEdges.select(col("doc_a"), lit(-1L).as("doc_b")).distinct()
    val comps = Dedup.connectedComponents(inEdges.unionByName(histEdges))
    val survivors = exact.join(
      comps.filter(col("rep_id") =!= col("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_anti")

    // Append this batch's state BEFORE the lazy tail below runs its
    // actions — the tail's plans pin pre-batch paths, so they cannot
    // see these writes.
    exact.select("text_hash").distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/fp/batch=$batchId")
    newBands.select(col("doc_id"), col("band"), col("bucket"))
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/bands/batch=$batchId")
    sh.select(col("doc_id"), col("shh"))
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/sh/batch=$batchId")

    // 4. Decontamination (stateless), 5. mixture (deterministic hash —
    // a doc draws the same verdict here as in the batch pipeline).
    val clean = benchmark match {
      case Some(b) =>
        survivors.join(
          Contamination.flagContamination(survivors, b)
            .filter(!col("contaminated")).select("doc_id"), "doc_id")
      case None => survivors
    }
    Sampling.mixtureSample(clean, "source", "doc_id", cfg.mixtureRates, cfg.defaultRate)
      .select(col("doc_id"), col("text"), col("source"))
  }

  /** `foreachBatch` adapter: curate each micro-batch and land the
    * survivors under `outDir/batch=<id>` (overwrite = retry-safe).
    */
  def sink(outDir: String): (DataFrame, Long) => Unit = (df, batchId) =>
    curateBatch(df, batchId)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
}
