package graft

import graft.ops.Frequency
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet")
    .select($"user_id", $"event_type")
    .cache()

  test("CMS heavy hitters: estimates >= exact, within eps*N") {
    val exact = events.groupBy($"user_id".as("group_id"), $"event_type".as("key"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = events.count()
    val est = Frequency.heavyHittersCms(events, "user_id", "event_type", eps = 0.001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    est.foreach { case (k, e) =>
      val ex = exact.getOrElse(k, 0L)
      assert(e >= ex, s"CMS under-counted $k: $e < $ex")
      assert(e <= ex + math.ceil(0.001 * n).toLong + 1, s"CMS over-counted $k: $e vs $ex")
    }
  }

  test("heavy hitters survive a high-cardinality key domain (no driver collect)") {
    // 5 heavy keys (8k occurrences each) buried in 160k unique tail keys.
    // The old implementation collected all ~160k distinct keys to the
    // driver; the Misra-Gries path must find the heavies with bounded
    // output and bounded task memory.
    val heavy = (0 until 5).flatMap(i => Seq.fill(8000)(s"heavy_$i"))
    val tail = (0 until 160000).map(i => s"tail_$i")
    val rows = (heavy ++ tail).map(k => (1L, k))
    val df = spark.createDataset(rows).toDF("g", "k").repartition(8)
    val got = Frequency.heavyHittersCms(df, "g", "k", eps = 0.001, topK = 8)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    (0 until 5).foreach { i =>
      val k = s"heavy_$i"
      assert(got.contains(k), s"$k missing from candidates")
      assert(got(k) >= 8000L, s"$k underestimated: ${got(k)}")
    }
    // Output is candidate-bounded, not domain-bounded.
    assert(got.size <= 8 * 8, s"candidate set exploded: ${got.size}")
  }

  test("bloom membership: no false negatives, few false positives") {
    val present = events.select($"user_id", $"event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val candidates = events.select($"event_type").distinct().as[String].collect().toSeq ++
      Seq("zz_not_a_type_1", "zz_not_a_type_2")
    val got = Frequency.bloomMembership(events, "user_id", "event_type", candidates)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    // No false negatives ever.
    present.foreach { case (g, k) => assert(got((g, k)), s"false negative for ($g,$k)") }
    // Absent sentinel keys: at 1% fpp over ~30 groups, allow a couple.
    val fps = got.count { case ((_, k), v) => v && k.startsWith("zz_not_a_type") }
    assert(fps <= 3, s"too many bloom false positives: $fps")
  }

  test("exact vs approx distinct counts per group") {
    val exact = Frequency.distinctExact(events, "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Frequency.distinctApprox(events, "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, ex) =>
      assert(math.abs(approx(g) - ex) <= math.max(1L, (ex * 0.2).toLong), s"group $g: $ex vs ${approx(g)}")
    }
  }

  test("exact top key matches hand computation") {
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "x"), (2L, "y") /* tie -> lexicographic x */).toDF("g", "k")
    val top = Frequency.topKeyExact(df, "g", "k")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(top(1L) == (("a", 2L)))
    assert(top(2L) == (("x", 1L)))
  }
}
