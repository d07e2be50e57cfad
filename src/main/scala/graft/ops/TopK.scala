package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One pruned candidate for the group-wise top-k reduction (top-level
  * so Spark derives a product encoder).
  */
private[graft] case class GroupCand(group: String, id: Long, value: Double)

/** Group-wise top-k: the k highest-`value` rows per group with the
  * deterministic (value desc, id asc) tie-break — "best k documents per
  * domain", "worst k per source", etc.
  *
  * Scale shape: a bare `row_number().over(Window.partitionBy(group))`
  * shuffles and sorts EVERY row. Here each input partition first keeps a
  * bounded per-group min-heap (same reduction as the similarity top-k,
  * `Similarity.rankTopK`), so only O(partitions * groups * k) rows reach
  * the shuffle, and the window then ranks that small set. Identical
  * output to the full window under the same tie-break. Heap memory per
  * task is O(groups-in-partition * k); for very-high-cardinality group
  * keys pre-repartition by group so each task sees few groups.
  */
object TopK {

  /** (group, id, rank, value), rank 1..k per group. `groupCol` is
    * stringly keyed in the output (cast as needed); `idCol` must be
    * integral and unique per row — it is the tie-break and identity.
    */
  def topKPerGroup(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    // Heap head = weakest kept candidate: lowest value, largest id on ties.
    val weakestFirst: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2))
    val pruned = df
      .select(col(groupCol).cast("string"), col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .mapPartitions { it =>
        val heaps = collection.mutable.HashMap
          .empty[String, collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (g, id, v) =>
          val h = heaps.getOrElseUpdate(g,
            collection.mutable.PriorityQueue.empty[(Double, Long)](weakestFirst))
          if (h.size < k) h.enqueue((v, id))
          else if (v > h.head._1 || (v == h.head._1 && id < h.head._2)) {
            h.dequeue(); h.enqueue((v, id))
          }
        }
        heaps.iterator.flatMap { case (g, h) =>
          h.iterator.map { case (v, id) => GroupCand(g, id, v) }
        }
      }
    val w = Window.partitionBy($"group").orderBy($"value".desc, $"id")
    pruned.toDF()
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"group", $"id", $"rank", $"value")
  }
}
