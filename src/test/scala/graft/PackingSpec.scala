package graft

import graft.ops.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed single-shard layout") {
    val df = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L)).toDF("doc_id", "n_toks")
    val out = Packing.packSequences(df, "n_toks", budget = 5L, nShards = 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"))).toMap
    // running starts: 0, 3, 7, 9 -> packs 0,0,1,1; offsets 0,3,2,4
    assert(out == Map(1L -> ((0L, 0L)), 2L -> ((0L, 3L)), 3L -> ((1L, 2L)), 4L -> ((1L, 4L))))
  }

  test("invariants on real docs: offsets within budget, start positions reconstruct") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", graft.ops.TextAnalysis.tokenCount($"text").cast("long").as("n_toks"))
    val out = Packing.packSequences(docs, "n_toks", budget = 512L, nShards = 8).persist()
    assert(out.count() == docs.count())
    assert(out.filter($"pack_offset" < 0 || $"pack_offset" >= 512).count() == 0)
    // pack_id*budget + pack_offset must equal the shard-ordered running sum
    val bad = out
      .withColumn("prev2", coalesce(sum($"n_tokens").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"shard").orderBy($"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .filter($"pack_id" * 512 + $"pack_offset" =!= $"prev2")
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("assignment is independent of input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", graft.ops.TextAnalysis.tokenCount($"text").cast("long").as("n_toks"))
    def runOn(d: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(d, "n_toks", budget = 128L, nShards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(runOn(docs) == runOn(docs.repartition(13)))
  }
}
