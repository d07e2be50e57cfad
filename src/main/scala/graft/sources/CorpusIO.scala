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
    */
  def readCsv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, idField: Option[String] = None): DataFrame = {
    val full = schema.add("_corrupt_record", "string")
    val text = spark.read.text(path)
    val body =
      if (header) text.where(col("value") =!= schema.fieldNames.mkString(","))
      else text
    val parsed = body.withColumn("p", from_csv(col("value"), full,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")))
    finish(parsed, schema, idField)
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
