package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Leakage-free splitting and token-budget sampling. */
class LeakageBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("leakageFreeSplit: clusters move atomically, singletons match split()") {
    val docs = (0L until 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // clusters: {0,1,2} (chain), {10,11}, rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Sampling.leakageFreeSplit(docs, pairs, "doc_id",
      Seq("train" -> 0.75, "test" -> 0.25))
    val bySplit = out.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // every cluster member shares its cluster's label
    assert(Set(bySplit(0L), bySplit(1L), bySplit(2L)).size == 1)
    assert(bySplit(10L) == bySplit(11L))
    // singletons agree with the plain per-id split
    val plain = Sampling.split(docs, "doc_id", Seq("train" -> 0.75, "test" -> 0.25))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val clustered = Set(0L, 1L, 2L, 10L, 11L)
    assert(bySplit.filterNot(kv => clustered(kv._1)) ==
      plain.filterNot(kv => clustered(kv._1)))
    // cluster label = the representative's (min id's) plain label
    assert(bySplit(1L) == plain(0L) && bySplit(11L) == plain(10L))
    // both splits are populated at these fractions
    assert(out.select("split").distinct().count() == 2)
  }

  test("leakageFreeSplit: no test doc has a near-dup in train (the contract)") {
    val docs = (0L until 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = (0L until 40L by 2L).map(i => (i, i + 1L)).toDF("doc_a", "doc_b")
    val out = Sampling.leakageFreeSplit(docs, pairs, "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
    val leak = out.as("x").join(out.as("y"),
        $"x.split" =!= $"y.split").join(pairs,
        ($"x.doc_id" === $"doc_a" && $"y.doc_id" === $"doc_b") ||
          ($"x.doc_id" === $"doc_b" && $"y.doc_id" === $"doc_a"))
    assert(leak.isEmpty, "a near-dup pair crossed the split boundary")
  }

  test("tokenBudgetSample: budgets bound totals, fill order is the portable hash") {
    val rows = (0L until 50L).map(i => (i, if (i < 25) "web" else "code", 10L))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val out = Sampling.tokenBudgetSample(df, "source", "doc_id", "n_tokens",
      Map("web" -> 100L, "code" -> 35L))
    val web = out.filter($"source" === "web")
    val code = out.filter($"source" === "code")
    assert(web.count() == 10, "100-token budget at 10 tokens/doc keeps exactly 10")
    // 35-token budget: docs fill at 10 each; the 4th starts at 30 < 35 -> kept
    assert(code.count() == 4, "budget overshoots by at most one document")
    // the kept web docs are exactly the 10 smallest by (hash, id)
    val expectWeb = rows.filter(_._2 == "web")
      .sortBy { case (i, _, _) => ((i * 2654435761L) % 4294967296L, i) }
      .take(10).map(_._1).toSet
    assert(web.select("doc_id").as[Long].collect().toSet == expectWeb)
  }

  test("weightedSamplePerGroup: exact parity with a driver-side replay") {
    val rows = (0L until 60L).map(i => (i, s"g${i % 3}", 1L + (i % 7) * 3L))
    val df = rows.toDF("doc_id", "source", "w")
    val got = Sampling.weightedSamplePerGroup(df, "source", "doc_id", "w", 4)
      .select($"source", $"doc_id", $"rank", $"score")
      .as[(String, Long, Int, Double)].collect().toSet
    val expect = rows
      .map { case (id, g, w) =>
        val u = (((id * 2654435761L) % 4294967296L) + 1L).toDouble / 4294967297.0
        (g, id, math.floor(math.log(u) / w * 1e6 + 0.5))
      }
      .groupBy(_._1).toSeq.flatMap { case (g, items) =>
        items.sortBy { case (_, id, s) => (-s, id) }.take(4).zipWithIndex
          .map { case ((_, id, s), i) => (g, id, i + 1, s) }
      }.toSet
    assert(got == expect)
  }

  test("weightedSamplePerGroup: a dominant weight always wins; w <= 0 excluded") {
    val df = ((0L until 20L).map(i => (i, "g", 1L)) :+ ((99L, "g", 1000000L)) :+
      ((100L, "g", 0L))).toDF("doc_id", "source", "w")
    val top = Sampling.weightedSamplePerGroup(df, "source", "doc_id", "w", 1)
      .select("doc_id").as[Long].head()
    assert(top == 99L, "the million-fold weight must win the race")
    val all = Sampling.weightedSamplePerGroup(df, "source", "doc_id", "w", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(!all.contains(100L), "zero weight cannot be sampled")
  }

  test("tokenBudgetSample: negative or null weights fail loudly, never over-admit") {
    val neg = Seq((1L, "g", 10L), (2L, "g", -5L), (3L, "g", 10L))
      .toDF("doc_id", "source", "n_tokens")
    intercept[Exception] {
      Sampling.tokenBudgetSample(neg, "source", "doc_id", "n_tokens",
        Map("g" -> 15L)).collect()
    }
    val nul = Seq((1L, "g", Some(10L)), (2L, "g", None))
      .toDF("doc_id", "source", "n_tokens")
    intercept[Exception] {
      Sampling.tokenBudgetSample(nul, "source", "doc_id", "n_tokens",
        Map("g" -> 15L)).collect()
    }
    // Zero-weight docs are legal (they never consume budget; one
    // arriving while budget remains is kept).
    val zero = Seq((1L, "g", 0L), (2L, "g", 10L)).toDF("doc_id", "source", "n_tokens")
    assert(Sampling.tokenBudgetSample(zero, "source", "doc_id", "n_tokens",
      Map("g" -> 11L)).count() == 2)
  }

  test("tokenBudgetSample: defaultBudget 0 drops unlisted groups; determinism") {
    val df = (0L until 30L).map(i => (i, s"g${i % 3}", 5L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.tokenBudgetSample(df, "source", "doc_id", "n_tokens",
      Map("g0" -> 20L))
    assert(out.select("source").distinct().as[String].collect().toSeq == Seq("g0"))
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Sampling.tokenBudgetSample(df.repartition(7), "source", "doc_id",
      "n_tokens", Map("g0" -> 20L)).select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }
}
