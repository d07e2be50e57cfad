package graft

import graft.tools.ScaleData
import org.apache.spark.sql.functions._

/** The N-fold replicator behind the 10x bench point: row counts
  * multiply, entity keys stay globally distinct across replicas (the
  * fan-out that makes it a fair larger-SF stand-in), constant dims
  * stay fixed, and the corpus does not collapse into exact duplicates.
  */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  test("3x replication: counts, key distinctness, fixed dims, distinct texts") {
    val out = java.nio.file.Files.createTempDirectory("graft_scale").toString
    ScaleData.scale(spark, "/root/testdata/sf0.001", out, 3)
    def cnt(src: String, t: String) = spark.read.parquet(s"$src/$t.parquet").count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(cnt(out, t) == 3 * cnt("/root/testdata/sf0.001", t), t)
    for (t <- Seq("nation", "region"))
      assert(cnt(out, t) == cnt("/root/testdata/sf0.001", t), s"$t is a constant dim")
    // Keys distinct across replicas.
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select($"doc_id").distinct().count() == docs.count())
    // No cross-replica key collisions: distinct key count multiplies
    // exactly (the source itself is not unique per (orderkey, line)).
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val srcLi = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert(li.select($"l_orderkey").distinct().count() ==
      3 * srcLi.select($"l_orderkey").distinct().count())
    // Fact->dim fan-out preserved: every replicated order's customer exists.
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
    // Replica marker keeps texts distinct (no 3x exact-dup collapse)
    // and n_chars stays consistent with the text.
    assert(docs.select($"text").distinct().count() == docs.count() ||
      // identical source texts may exist WITHIN a replica by design;
      // require only that replicas did not collapse: distinct >= 3x the
      // source's distinct count minus within-replica duplicates
      docs.select($"text").distinct().count() >=
        3 * spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select($"text").distinct().count() - 2)
    assert(docs.filter(length($"text") =!= $"n_chars").count() == 0)
  }
}
