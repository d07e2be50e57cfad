package graft

import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed top-2 per group with value ties broken by id") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 7.0), ("a", 3L, 7.0), ("a", 4L, 1.0),
      ("b", 5L, 2.0),
      ("c", 6L, 3.0), ("c", 7L, 3.0), ("c", 8L, 3.0)).toDF("g", "id", "v")
    val out = TopK.topKPerGroup(df, "g", "id", "v", 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(out == Set(
      ("a", 2L, 1, 7.0), ("a", 3L, 2, 7.0), // tie at 7.0 -> lower id first; 5.0 cut
      ("b", 5L, 1, 2.0),                    // group smaller than k: all rows kept
      ("c", 6L, 1, 3.0), ("c", 7L, 2, 3.0)))
  }

  test("bounded-heap reduction equals the full window rank on skewed random data") {
    val n = 20000
    val rnd = new scala.util.Random(7)
    // few hot groups + a long tail, heavy value ties to stress the tie-break
    val rows = (0 until n).map { i =>
      val g = if (rnd.nextBoolean()) s"hot${rnd.nextInt(3)}" else s"cold${rnd.nextInt(200)}"
      (g, i.toLong, rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("g", "id", "v").repartition(16)
    val fast = TopK.topKPerGroup(df, "g", "id", "v", 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val slow = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 7)
      .select($"g", $"id", $"rank", $"v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(fast == slow)
  }
}
