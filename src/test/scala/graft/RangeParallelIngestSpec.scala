package graft

import graft.core.Ingest
import org.apache.spark.sql.functions._

/** prepareRangeParallel must be bit-identical to prepare (default mode)
  * while spreading a single stream over many tasks.
  */
class RangeParallelIngestSpec extends SparkSpec {
  import spark.implicits._

  private def randomRaw(seed: Int, nStreams: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (rnd.nextInt(nStreams).toLong, rnd.nextInt(500).toLong,
        rnd.nextDouble(), i.toLong)
    }.toDF("streamId", "ts", "value", "arrival")
  }

  test("equals sequential prepare on random data (ties, duplicates, several seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val raw = randomRaw(seed, nStreams = 7, n = 3000)
      val a = Ingest.prepare(raw).collect().sortBy(e => (e.streamId, e.seq)).toSeq
      val b = Ingest.prepareRangeParallel(raw, numPartitions = 11)
        .collect().sortBy(e => (e.streamId, e.seq)).toSeq
      assert(a == b, s"seed $seed: range-parallel != sequential")
    }
  }

  test("equals sequential prepare with baseTs frontiers (clamp chains cross partitions)") {
    // Frontier far above most raw timestamps: long bump chains that
    // must thread correctly through partition boundaries.
    val raw = randomRaw(42, nStreams = 3, n = 2000)
    val base = Map(0L -> 400L, 1L -> 10000L)
    val a = Ingest.prepare(raw, baseTs = base).collect().sortBy(e => (e.streamId, e.seq)).toSeq
    val b = Ingest.prepareRangeParallel(raw, baseTs = base, numPartitions = 13)
      .collect().sortBy(e => (e.streamId, e.seq)).toSeq
    assert(a == b)
  }

  test("a single stream spreads across many tasks") {
    val raw = spark.range(100000)
      .select(lit(1L).as("streamId"), ($"id" * 3).as("ts"),
        rand(5).as("value"), $"id".as("arrival"))
    val out = Ingest.prepareRangeParallel(raw, numPartitions = 16)
    val used = out.toDF()
      .withColumn("pid", spark_partition_id())
      .select("pid").distinct().count()
    assert(used >= 8, s"single stream used only $used tasks")
    // And the result is still a dense, clamp-valid ranking.
    val rows = out.collect().sortBy(_.seq)
    assert(rows.map(_.seq).toSeq == (0L until 100000L))
    assert(rows.sliding(2).forall(p => p(1).ts >= p(0).ts))
  }
}
