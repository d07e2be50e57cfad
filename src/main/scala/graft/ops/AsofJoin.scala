package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-past) join: for every left row, the latest right row
  * with `right.ts <= left.ts` within the same key — THE time-series
  * lookup (mark-to-market, sensor calibration, config-at-time). Spark
  * has no native asof operator; the naive formulations are a range
  * self-join (quadratic blowup per key) or a per-key collect (driver
  * bound).
  *
  * This one is a single co-partitioned pass: tag both sides, union,
  * sort within each key partition by (ts, right-first), and
  * carry-forward the most recent right payload with
  * `last(_, ignoreNulls) over rows unbounded-preceding..current` —
  * one shuffle on the key, no join explosion, window never buffers
  * more than the running row. Equal timestamps: the right row sorts
  * FIRST, so a mark AT the left row's timestamp is visible to it
  * (inclusive `>=` semantics, matching DuckDB/kdb ASOF).
  *
  * Scale: parallelism is per key (streams are the unit, as everywhere
  * in this engine); within a key the sort is the shuffle's sort, not an
  * extra pass. Left rows preceding every right row get NULL payloads —
  * ASOF LEFT JOIN semantics.
  */
object AsofJoin {

  /** `left` asof-joins `right` on equal `keyCol` and
    * `right.tsCol <= left.tsCol`. Right payload columns arrive as
    * `asof_<name>`; the right timestamp as `asof_ts`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__isRight", lit(0))
      .withColumn("__asof_ts", lit(null).cast("long"))
      .select(
        col(keyCol) +: col(tsCol) +: col("__isRight") +: col("__asof_ts") +:
          (payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
            leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
    val r = right
      .withColumn("__isRight", lit(1))
      .withColumn("__asof_ts", col(tsCol).cast("long"))
      .select(
        col(keyCol) +: col(tsCol) +: col("__isRight") +: col("__asof_ts") +:
          (payloadCols.map(c => col(c).as(s"__p_$c")) ++
            leftCols.filterNot(c => c == keyCol || c == tsCol)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // Right rows first at equal ts (descending __isRight) so an exactly
    // coincident mark is already "seen" when the left row is evaluated.
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("asof_ts", last(col("__asof_ts"), ignoreNulls = true).over(w))
      .withColumns(
        payloadCols.map(c => s"asof_$c" ->
          last(col(s"__p_$c"), ignoreNulls = true).over(w)).toMap)

    carried
      .filter(col("__isRight") === 0)
      .select(
        leftCols.map(col) ++
          (col("asof_ts") +: payloadCols.map(c => col(s"asof_$c"))): _*)
  }
}
