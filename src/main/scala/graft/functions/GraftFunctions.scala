package graft.functions

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** SQL-surface registration: expose the engine's scalar kernels and
  * aggregators to `spark.sql` users under a `graft_` prefix, so the
  * library is usable from pure SQL (the reference has no SQL surface;
  * this is part of being a complete Spark citizen).
  */
object GraftFunctions {

  // Idempotence guards: registration happens once per live session —
  // repeated register()/cosineCol() calls (every query built by
  // SparkEntry re-enters here) must not re-register and spam
  // "function replaced" warnings. Weak keys: sessions stay collectable.
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = registered.synchronized {
    if (registered.contains(spark)) return
    registered.add(spark)
    val u = spark.udf
    u.register("graft_simhash", (t: String) => Dedup.simhash(t))
    u.register("graft_fingerprint", (t: String) => TextAnalysis.fingerprint(t))
    u.register("graft_lang_id", (t: String) => TextAnalysis.detectLanguage(t))
    u.register("graft_jaccard", (a: String, b: String) =>
      Dedup.jaccard(Dedup.shingleSet(a), Dedup.shingleSet(b)))
    u.register("graft_minhash", (t: String) => Dedup.signature(Dedup.shingleSet(t)))
    u.register("graft_cosine", (a: Seq[Float], b: Seq[Float]) => Similarity.cosine(a, b))
    u.register("graft_welford", udaf(new WelfordAggregator))
    u.register("graft_bloom_agg", udaf(new Sketches.BloomAggregator()))
    u.register("graft_cms_agg", udaf(new Sketches.CmsAggregator()))
    u.register("graft_bloom_contains", (bloom: Array[Byte], item: String) =>
      Sketches.mightContain(bloom, item))
    u.register("graft_cms_estimate", (cms: Array[Byte], item: String) =>
      Sketches.cmsEstimate(cms, item))

    registerNativeCosine(spark)
    registerNativeNfc(spark)
    registerComposed(spark)
  }

  /** Composed column expressions (chains of built-in codegen'd
    * functions) exposed to SQL: `graft_html_text(html[, minWords])`,
    * `graft_url_normalize(url)`, `graft_url_domain(url)`. These are
    * NOT UDFs — the registry builder splices the same expression tree
    * the Column API builds, so SQL callers get whole-stage codegen.
    */
  def registerComposed(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def define(name: String)(
        build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.Column): Unit = {
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(
          id.funcName, children => ColumnBridge.toExpression(build(children)), "built-in")
    }
    define("graft_html_text") { children =>
      val minWords = children.lift(1) match {
        case None => 1
        case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
        case Some(other) => throw new IllegalArgumentException(
          s"graft_html_text: minWords must be an integer literal, got $other")
      }
      graft.ops.HtmlExtract.extractText(ColumnBridge.toColumn(children.head), minWords)
    }
    define("graft_url_normalize") { children =>
      graft.ops.UrlCuration.normalizeUrl(ColumnBridge.toColumn(children.head))
    }
    define("graft_url_domain") { children =>
      graft.ops.UrlCuration.registeredDomain(
        graft.ops.UrlCuration.host(
          graft.ops.UrlCuration.normalizeUrl(ColumnBridge.toColumn(children.head))))
    }
  }

  /** `graft_nfc(text)`: Unicode NFC normalization as a native codegen
    * expression — see [[NfcNormalize]]. */
  def registerNativeNfc(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        id.funcName,
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          NfcNormalize(children.head),
        "built-in")
  }

  /** Native codegen expression (not a UDF): registered straight into
    * the function registry so `expr("graft_cosine_native(a, b)")` and
    * SQL both compile to the tight primitive loop. The single shared
    * registration point for the SQL and Column paths.
    */
  def registerNativeCosine(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine_native")
    if (!reg.functionExists(id)) // idempotent: skip the replace-warning path
      reg.createOrReplaceTempFunction(
        id.funcName,
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarity(children(0), children(1)),
        "built-in")
  }
}
