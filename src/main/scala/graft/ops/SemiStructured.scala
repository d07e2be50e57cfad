package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-on-read promotion for semi-structured metadata columns —
  * crawl dumps, event streams, and API exports routinely carry a JSON
  * string column (`events.props` in the test corpus) whose fields the
  * pipeline needs as TYPED columns for pushdown-able filters and
  * codegen aggregation.
  *
  * Two stages, both 100 TB-shaped:
  *
  *   1. [[inferSchema]] — infer the struct schema from a BOUNDED
  *      deterministic sample (bottom-k of the portable row hash, the
  *      [[Sampling]] discipline): one pass to draw k rows, one
  *      driver-side `schema_of_json`-union over k strings. Never scans
  *      the corpus twice, never collects more than k documents, and the
  *      sample — hence the inferred schema — is reproducible across
  *      runs and cluster layouts.
  *   2. [[promote]] — `from_json` with the (inferred or user-fixed)
  *      schema: a codegen projection, no UDF. Fields become real typed
  *      columns; rows whose JSON fails to parse keep NULL fields and
  *      are flagged `_corrupt` so a curation stage can count or divert
  *      them (silently nulled metadata is how bad documents sneak
  *      through quality filters).
  *
  * For production tables the inferred schema should be inspected and
  * pinned (printed via `schema.toDDL`) — inference is a bootstrap, not
  * a contract; a fixed DDL string keeps the scan schema stable as the
  * corpus evolves.
  */
object SemiStructured {

  /** Infer the JSON struct schema from a deterministic bottom-k sample
    * of non-null values of `jsonCol`, keyed by `idCol` (integral,
    * non-negative — the [[Sampling.hashKey]] domain). Returns a
    * StructType that is the Spark-inferred union over the sampled
    * strings (fields missing in some rows stay nullable, numeric
    * widths widen).
    */
  def inferSchema(df: DataFrame, jsonCol: String, idCol: String, k: Int = 256): DataType = {
    val spark = df.sparkSession
    import spark.implicits._
    val sampled = df
      .filter(col(jsonCol).isNotNull)
      .select(col(jsonCol).cast("string").as("j"), Sampling.hashKey(idCol).as("hk"))
      .orderBy($"hk")
      .limit(k)
      .select($"j").as[String].collect()
    require(sampled.nonEmpty, s"no non-null '$jsonCol' values to infer from")
    // Spark's own JSON schema inference over the sampled strings (the
    // same inference `spark.read.json` runs, here over k rows instead
    // of the corpus).
    spark.read.json(spark.createDataset(sampled.toIndexedSeq)).schema
  }

  /** Promote `jsonCol` into typed top-level columns under `prefix`
    * (default: the field names themselves), with a `_corrupt` flag for
    * rows whose non-null JSON failed to parse. The original column is
    * kept — dropping source data is a caller decision.
    */
  def promote(
      df: DataFrame,
      jsonCol: String,
      schema: StructType,
      prefix: String = ""): DataFrame = {
    // PERMISSIVE from_json yields a row of nulls for malformed input
    // (not a null struct), so corruption is detected the standard way:
    // a corrupt-record column that is non-null exactly when the parser
    // fell back.
    val crCol = "_graft_corrupt_record"
    require(!schema.fieldNames.contains(crCol), s"schema already has $crCol")
    val schemaCr = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(crCol, org.apache.spark.sql.types.StringType))
    val parsed = from_json(col(jsonCol).cast("string"), schemaCr,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> crCol))
    val corrupt: Column =
      col(jsonCol).isNotNull && col("_parsed").getField(crCol).isNotNull
    val promoted = schema.fields.toIndexedSeq.map(f =>
      col("_parsed").getField(f.name).as(s"$prefix${f.name}"))
    df.withColumn("_parsed", parsed)
      .select(df.columns.toIndexedSeq.map(col) ++ promoted :+ corrupt.as("_corrupt"): _*)
  }
}
