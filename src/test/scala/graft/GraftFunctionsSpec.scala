package graft

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions work from spark.sql") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox and the lazy dog in the yard"),
        (2L, "der schnelle braune fuchs und der faule hund"))
      .toDF("id", "text").createOrReplaceTempView("t")

    val langs = spark.sql("SELECT id, graft_lang_id(text) AS lang FROM t ORDER BY id")
      .collect().map(_.getString(1)).toSeq
    assert(langs == Seq("en", "de"))

    val j = spark.sql(
      "SELECT graft_jaccard('a b c d e', 'a b c d e') AS s").head().getDouble(0)
    assert(j == 1.0)

    val sim = spark.sql("SELECT graft_simhash(text) AS h FROM t").collect().map(_.getLong(0))
    assert(sim.distinct.length == 2)

    val w = spark.sql("SELECT graft_welford(CAST(id AS DOUBLE)) AS w FROM t").head().getStruct(0)
    assert(w.getAs[Long]("count") == 2L && w.getAs[Double]("mean") == 1.5)

    val bloom = spark.sql(
      "SELECT graft_bloom_contains(graft_bloom_agg(text), 'der schnelle braune fuchs und der faule hund') AS m FROM t")
      .head().getBoolean(0)
    assert(bloom)

    val cms = spark.sql(
      "SELECT graft_cms_estimate(graft_cms_agg(text), 'the quick brown fox and the lazy dog in the yard') AS c FROM t")
      .head().getLong(0)
    assert(cms == 1L)
  }

  test("composed expression functions: html/url from pure SQL, no UDF in the plan") {
    GraftFunctions.register(spark)
    val html = spark.sql(
      "SELECT graft_html_text('<html><script>x()</script><h1>Title Here</h1><p>body text</p></html>') AS t")
      .head().getString(0)
    assert(html == "Title Here\nbody text")
    val htmlMin = spark.sql(
      "SELECT graft_html_text('<ul><li>Nav</li></ul><p>three word line</p>', 3) AS t")
      .head().getString(0)
    assert(htmlMin == "three word line")
    val norm = spark.sql(
      "SELECT graft_url_normalize('HTTP://A.Test:80/p/?utm_source=x&z=1#f') AS u")
      .head().getString(0)
    assert(norm == "http://a.test/p?z=1")
    val dom = spark.sql(
      "SELECT graft_url_domain('https://www.blog.Example.co.uk/x') AS d")
      .head().getString(0)
    assert(dom == "example.co.uk")
    // Expression splice, not a UDF: the physical plan must show no
    // BatchEvalPython/ScalaUDF nodes for these calls.
    val plan = spark.sql("SELECT graft_url_normalize('http://a.test/') AS u")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"composed fn compiled to a UDF:\n$plan")
  }
}
