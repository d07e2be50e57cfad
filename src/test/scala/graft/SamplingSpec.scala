package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified top-k: <= k per stratum, deterministic across runs and partitionings") {
    val a = Sampling.stratifiedTopK(docs, "lang", "doc_id", 5)
      .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(Sampling.stratifiedTopK(docs, "lang", "doc_id", 5)
      .groupBy($"lang").count().filter($"count" > 5).count() == 0)
    val b = Sampling.stratifiedTopK(docs.repartition(17), "lang", "doc_id", 5)
      .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b, "sample depends on partitioning")
  }

  test("hash sample: deterministic subset, roughly the requested fraction, filter-only plan") {
    val n = docs.count()
    val s = Sampling.hashSample(docs, "doc_id", 0.25)
    val m = s.count()
    assert(math.abs(m.toDouble / n - 0.25) < 0.15, s"fraction off: $m/$n")
    // Pure filter: no shuffle exchange in the plan.
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashSample should not shuffle:\n$plan")
    // Subset property: sample(0.25) is contained in sample(0.5).
    val small = s.select($"doc_id").as[Long].collect().toSet
    val big = Sampling.hashSample(docs, "doc_id", 0.5).select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("hashKey: exact (id*K) mod 2^32 beyond the Long-wrap point; negatives raise") {
    // Naive col*2654435761 wraps Long at ids >= ~2^31.7. The split
    // multiply must equal big-integer arithmetic for the whole Long range.
    val ids = Seq(0L, 1L, Int.MaxValue.toLong, (1L << 32) - 1, 1L << 32,
      (1L << 32) + 5, 3000000000L, 123456789012345L, Long.MaxValue)
    val got = ids.toDF("id").select(Sampling.hashKey("id").as("k")).as[Long].collect()
    val want = ids.map(id =>
      ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong)
    assert(got.toSeq == want, s"hashKey diverged from exact arithmetic:\n$got\n$want")
    val ex = intercept[Exception] {
      Seq(-1L).toDF("id").select(Sampling.hashKey("id")).collect()
    }
    assert(ex.getMessage.contains("negative id") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative id")))
  }

  test("mixture sample: per-domain rates, shuffle-free, rate-1 domain kept whole") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.5)
    val s = Sampling.mixtureSample(docs, "source", "doc_id", rates, defaultRate = 0.0)
    val bySrc = s.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == full("src0"), "rate-1.0 domain must be kept in full")
    assert(bySrc.getOrElse("src1", 0L) < full("src1"))
    assert(bySrc.keySet.subsetOf(Set("src0", "src1")), "defaultRate=0 drops other domains")
    // membership agrees with hashSample at the same rate within each domain
    val viaHash = Sampling.hashSample(docs.filter($"source" === "src1"), "doc_id", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val viaMix = s.filter($"source" === "src1")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(viaMix == viaHash)
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixtureSample should not shuffle:\n$plan")
  }

  test("mixtureSampleRepeats: rate > 1 repeats, fraction matches subsample, rate 0 drops") {
    val rates = Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25)
    val out = Sampling.mixtureSampleRepeats(docs, "source", "doc_id", rates)
    val bySrc = out.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet.subsetOf(rates.keySet), "defaultRate=0 drops other domains")
    def n(src: String) = docs.filter($"source" === src).count()
    // src0 at 2.5: two full copies + the 0.5 hash-subsample.
    val frac0 = Sampling.hashSample(docs.filter($"source" === "src0"), "doc_id", 0.5).count()
    assert(bySrc("src0") == 2 * n("src0") + frac0)
    assert(bySrc("src1") == n("src1"))
    // copy indices: src0 in {0,1,2}, src1 only 0, and each (doc, copy)
    // appears once.
    val copies = out.filter($"source" === "src0").select($"copy").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(copies.subsetOf(Set(0L, 1L, 2L)) && copies.contains(1L))
    assert(out.filter($"source" === "src1").select($"copy").distinct()
      .collect().map(_.getLong(0)).toSet == Set(0L))
    assert(out.groupBy($"doc_id", $"copy").count().filter($"count" > 1).count() == 0)
    // fractional copy membership == mixtureSample at the fractional rate
    val fracSet = out.filter($"source" === "src0" && $"copy" === 2L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val expect = Sampling.mixtureSample(docs, "source", "doc_id", Map("src0" -> 0.5))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(fracSet == expect)
  }

  test("epoch order: reproducible, epochs permute differently, arithmetic exact") {
    val k0 = docs.select($"doc_id", Sampling.epochOrderKey("doc_id", 0).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k0b = docs.repartition(9)
      .select($"doc_id", Sampling.epochOrderKey("doc_id", 0).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k0 == k0b, "key must be a pure function of (id, epoch)")
    val k1 = docs.select($"doc_id", Sampling.epochOrderKey("doc_id", 1).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Different epochs give a genuinely different order.
    val ord0 = k0.toSeq.sortBy { case (id, k) => (k, id) }.map(_._1)
    val ord1 = k1.toSeq.sortBy { case (id, k) => (k, id) }.map(_._1)
    assert(ord0 != ord1, "epochs must permute differently")
    assert(ord0.toSet == ord1.toSet, "same documents, different order")
    // Exact arithmetic replay.
    k0.foreach { case (id, k) =>
      assert(k == (id % 4294967296L) * 31L % 4294967296L * 2654435761L % 4294967296L
        || k == BigInt(id % 4294967296L).*(31).+(0).*(BigInt(2654435761L)).mod(BigInt(4294967296L)).toLong)
    }
    // epochShuffled returns every row exactly once.
    assert(Sampling.epochShuffled(docs, "doc_id", 3).count() == docs.count())
  }

  test("split: disjoint, exhaustive, dyadic fractions land exactly") {
    val sp = Sampling.split(docs, "doc_id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(sp.count() == docs.count())
    val byLabel = sp.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == docs.count())
    // Splits must be a function of doc_id only: re-splitting a shuffled
    // frame gives identical assignments.
    val again = Sampling.split(docs.repartition(13), "doc_id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    assert(sp.select($"doc_id", $"split").exceptAll(again.select($"doc_id", $"split")).isEmpty)
  }
}
