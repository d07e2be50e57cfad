package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus ingestion from the interchange formats crawl dumps actually
  * arrive in — JSONL (optionally gzipped; Spark decompresses by file
  * extension) and CSV — normalized toward the `documents` table shape
  * the operator layer consumes. Two disciplines the raw Spark readers
  * leave to the caller:
  *
  *   1. **Corrupt records are flagged, never dropped.** Each line is
  *      read as text and parsed with `from_json`/`from_csv` in the
  *      projection, so `_corrupt` and `_corrupt_record` are ordinary
  *      columns — including the raw line — with none of the
  *      datasource layer's corrupt-column-only query restriction
  *      (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`). A
  *      curation pipeline must COUNT what it could not parse;
  *      silently vanished rows are how ingestion bugs hide.
  *   2. **Schema is pinned, not re-inferred.** Pass `schema`; when
  *      bootstrapping, [[inferJsonlSchema]] reads a bounded
  *      deterministic sample (never a full inference scan). Print
  *      `.toDDL` once and pin it.
  *
  * Id-less corpora get `doc_id = xxhash64(raw line)`: deterministic
  * under any partitioning or file order (unlike
  * `monotonically_increasing_id`), with the documented consequence
  * that byte-identical records collapse to one id — for a training
  * corpus that is exact-dedup semantics arriving early; feed the
  * arrival-order-sensitive operators ([[graft.streaming
  * .StreamingLineDedup]] et al.) an explicit id column instead.
  *
  * Scale shape: a text scan plus one codegen'd parse projection — the
  * same work the datasource reader does, minus its restrictions; all
  * downstream pruning/pushdown applies to the parsed frame normally.
  */
object CorpusIO {

  /** Bounded-sample schema inference for JSONL: take the k smallest
    * (xxhash64(line), line) pairs — a deterministic bottom-k draw, one
    * pass — and union their inferred schemas. Never collects more
    * than k lines.
    */
  def inferJsonlSchema(spark: SparkSession, path: String, k: Int = 256): StructType = {
    import spark.implicits._
    val sample = spark.read.text(path)
      .select(xxhash64(col("value")).as("hk"), col("value"))
      .orderBy(col("hk"), col("value")).limit(k)
      .select(col("value")).as[String]
    spark.read.json(sample).schema
  }

  private def withId(parsed: DataFrame, idField: Option[String]): DataFrame =
    idField match {
      case Some(f) => parsed.withColumn("doc_id", col(f).cast("long"))
      case None => parsed.withColumn("doc_id", xxhash64(col("_raw")))
    }

  private def finish(parsed: DataFrame, schema: StructType,
      idField: Option[String]): DataFrame =
    withId(parsed
      .select((schema.fieldNames.map(f => col(s"p.$f")) ++ Seq(
        col("p._corrupt_record").isNotNull.as("_corrupt"),
        col("p._corrupt_record").as("_corrupt_record"),
        col("value").as("_raw"))).toSeq: _*), idField)
      .drop("_raw")

  /** Read a JSONL corpus. Unparseable lines land with every data field
    * null, `_corrupt = true`, and the raw line in `_corrupt_record`.
    */
  def readJsonl(
      spark: SparkSession, path: String, schema: StructType,
      idField: Option[String] = None): DataFrame = {
    val full = schema.add("_corrupt_record", "string")
    val parsed = spark.read.text(path)
      .withColumn("p", from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    finish(parsed, schema, idField)
  }

  /** Read a CSV corpus with the same corrupt-record discipline. With
    * `header = true`, lines byte-equal to the schema's comma-joined
    * field names are dropped (one per input file).
    *
    * RECORD = LINE in the default path: the line-by-line parse cannot
    * reassemble quoted fields containing embedded newlines (common for
    * document text exported as CSV) — such records split into flagged
    * corrupt fragments. For corpora that quote newlines, pass
    * `multiLine = true`: the datasource CSV reader then handles quoted
    * record spans (at the cost of per-file rather than per-line input
    * splits — multiline CSV is not splittable), still PERMISSIVE with
    * `_corrupt`/`_corrupt_record` populated. In that mode an id-less
    * corpus gets `doc_id = xxhash64(to_json(all fields))` (the raw
    * line is not available), same determinism, same
    * identical-records-collapse caveat.
    */
  def readCsv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, idField: Option[String] = None,
      multiLine: Boolean = false): DataFrame = {
    val full = schema.add("_corrupt_record", "string")
    if (multiLine) {
      // The datasource reader refuses scans whose required schema is
      // ONLY the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
      // which is exactly what a pruned `select(_corrupt)` / corrupt
      // count compiles to. `_corrupt` therefore keeps one data-field
      // reference alive via an always-true term the optimizer cannot
      // constant-fold (length >= 0), so corrupt-only queries still
      // plan. (Queries selecting only `_corrupt_record` itself remain
      // subject to the engine restriction; use `_corrupt` to filter.)
      val f0 = col(schema.fieldNames.head)
      val keepScan = length(coalesce(f0.cast("string"), lit(""))) >= 0
      val parsed = spark.read
        .options(Map(
          "header" -> header.toString, "multiLine" -> "true",
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record"))
        .schema(full)
        .csv(path)
        .withColumn("_corrupt", keepScan && col("_corrupt_record").isNotNull)
      val cols = schema.fieldNames.map(col) ++
        Seq(col("_corrupt"), col("_corrupt_record"))
      val flat = parsed.select(cols.toSeq: _*)
      idField match {
        case Some(f) => flat.withColumn("doc_id", col(f).cast("long"))
        case None => flat.withColumn("doc_id",
          xxhash64(to_json(struct(schema.fieldNames.map(col).toSeq: _*))))
      }
    } else {
      val text = spark.read.text(path)
      val body =
        if (header) text.where(col("value") =!= schema.fieldNames.mkString(","))
        else text
      val parsed = body.withColumn("p", from_csv(col("value"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
      finish(parsed, schema, idField)
    }
  }

  /** Write a frame back out as JSONL for interchange (gzip-compressed
    * by default — the format crawl pipelines exchange). One file per
    * partition; size output files by repartitioning first or
    * compacting after ([[BucketedLayout.compact]]). Internal columns
    * (`_corrupt*`) are dropped — re-exporting parse failures verbatim
    * belongs to an explicit quarantine path, not the clean feed.
    */
  def writeJsonl(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    val clean = df.drop("_corrupt", "_corrupt_record")
    val w = clean.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** Corrupt-rate report: (n_rows, n_corrupt) — the ingestion health
    * line every pipeline run should log. */
  def corruptStats(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(when(col("_corrupt"), 1L).otherwise(0L))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
