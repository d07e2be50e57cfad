package graft

import graft.ops.SemiStructured
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Schema inference from a bounded sample + typed promotion with the
  * corrupt flag.
  */
class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (0L, """{"k": 1, "tag": "a"}"""),
    (1L, """{"k": 2, "tag": "b"}"""),
    (2L, """{"k": 3}"""),
    (3L, """not json at all"""),
    (4L, null.asInstanceOf[String])
  ).toDF("id", "props")

  test("inference unions fields across sampled rows and is deterministic") {
    val clean = df.filter($"id" <= 2L)
    val s1 = SemiStructured.inferSchema(clean, "props", "id").asInstanceOf[StructType]
    val s2 = SemiStructured.inferSchema(clean, "props", "id").asInstanceOf[StructType]
    assert(s1 == s2)
    assert(s1.fieldNames.sorted.toSeq == Seq("k", "tag"))
    assert(s1("k").dataType == LongType && s1("tag").dataType == StringType)
  }

  test("promotion types fields, nulls missing ones, flags corrupt rows") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("tag", StringType)))
    val out = SemiStructured.promote(df, "props", schema)
      .select($"id", $"k", $"tag", $"_corrupt")
      .as[(Long, Option[Long], Option[String], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, Some(1L), Some("a"), false),
      (1L, Some(2L), Some("b"), false),
      (2L, Some(3L), None, false), // field absent -> null, NOT corrupt
      (3L, None, None, true), // unparseable -> corrupt
      (4L, None, None, false))) // null source -> not corrupt
  }

  test("bounded sampling: inference never collects more than k rows") {
    // 10k rows, k = 16: would OOM-protect at scale; here just proves
    // the path works with k << N and still sees a parseable row.
    val big = spark.range(0, 10000)
      .select($"id", concat(lit("""{"k": """), $"id", lit("}")).as("props"))
    val s = SemiStructured.inferSchema(big, "props", "id", k = 16).asInstanceOf[StructType]
    assert(s.fieldNames.toSeq == Seq("k"))
  }
}
