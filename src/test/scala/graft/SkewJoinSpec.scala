package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join: same rows as plain join, hot key spread over many tasks") {
    // 100k rows, 90% on one hot key.
    val big = spark.range(100000)
      .select(when($"id" % 10 < 9, 1L).otherwise($"id" % 100L).as("k"),
        $"id".as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts = 16)

    // Correctness: identical multiset of rows.
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // Skew relief: in the salted join's output partitioning, the hot
    // key's rows occupy many partitions; a plain key-hash shuffle puts
    // them all in one.
    // (test session runs shuffle.partitions=4, so 16 salts can reach at
    // most 4 distinct partitions; ~3.96 expected)
    val hotParts = salted.filter($"k" === 1L)
      .select(spark_partition_id().as("pid")).distinct().count()
    assert(hotParts >= 3, s"hot key only spread over $hotParts partitions")

    val plainParts = big.repartition(32, $"k").filter($"k" === 1L)
      .select(spark_partition_id().as("pid")).distinct().count()
    assert(plainParts == 1L)
  }
}
