package graft

import graft.ops.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val dim = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .where($"o_orderkey" % 97 === 0)

  test("pruned inner join is row-identical to the plain join") {
    val pruned = BloomJoin.prunedJoin(lineitem, dim, "l_orderkey", "o_orderkey")
    val plain = lineitem.join(dim, lineitem("l_orderkey") === dim("o_orderkey"))
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("pruned left_semi join is row-identical to the plain left_semi") {
    val pruned = BloomJoin.prunedJoin(
      lineitem, dim, "l_orderkey", "o_orderkey", joinType = "left_semi")
    val plain = lineitem.join(
      dim, lineitem("l_orderkey") === dim("o_orderkey"), "left_semi")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("pruning actually reduces the big side, and never below the match set") {
    val (in, pruned, matched) =
      BloomJoin.pruneStats(lineitem, dim, "l_orderkey", "o_orderkey")
    assert(matched <= pruned, "bloom must have no false negatives")
    assert(pruned < in / 2,
      s"a ~1% dimension should prune most of the fact side: $pruned of $in")
    assert(pruned <= matched + math.max(64L, (in * 0.05).toLong),
      s"false-positive passthrough out of band: in=$in pruned=$pruned matched=$matched")
  }

  test("string keys work (xxhash64 probe generalizes beyond numerics)") {
    val big = (0L until 1000L).map(i => (s"key_${i % 100}", i)).toDF("k", "v")
    val small = Seq("key_3", "key_7", "key_42").toDF("dk")
    val pruned = BloomJoin.prunedJoin(big, small, "k", "dk")
    val plain = big.join(small, big("k") === small("dk"))
    assert(pruned.count() == 30 &&
      pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("outer join types are rejected") {
    intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(lineitem, dim, "l_orderkey", "o_orderkey", "left_outer")
    }
  }

  test("empty small side prunes everything") {
    val none = dim.where(lit(false))
    val out = BloomJoin.prunedJoin(lineitem, none, "l_orderkey", "o_orderkey")
    assert(out.isEmpty)
  }
}
