package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization of embedding columns — the standard
  * 4x storage/bandwidth compression for vector corpora (a 100 TB
  * float32 embedding store is 25 TB at int8 with ~1e-2 cosine error,
  * which is why every large-scale ANN system ships it).
  *
  * Everything is expressed in built-in higher-order functions
  * (`transform` / `aggregate` / `array_max`), so the whole pass is one
  * codegen'd projection — no UDF, no shuffle, column-prunable.
  *
  * Rounding is `floor(x * 127 / scale + 0.5)` — NOT the engine round():
  * round-half-even vs round-half-away varies by engine, while floor on
  * IEEE doubles is bit-reproducible everywhere, which is what makes the
  * quantized values oracle-checkable in an external engine (the same
  * trick `Sampling.hashKey` uses for portable selection).
  */
object Quantization {

  private def dbl(c: Column): Column = c.cast("double")

  /** Per-vector scale: max |v_i| as double (exact — float to double is
    * widening, abs/max do no arithmetic).
    */
  private def scaleOf(vec: Column): Column =
    array_max(transform(vec, x => abs(dbl(x))))

  /** Quantize: adds `q_scale` (double) and `q_vec` (array<long> in
    * [-127, 127]) next to the original columns. Zero vectors quantize
    * to all-zero (guarded — no NaN from 0/0).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    df.withColumn("q_scale", scaleOf(v))
      .withColumn("q_vec",
        transform(v, x =>
          when(col("q_scale") === 0.0, lit(0L))
            .otherwise(floor(dbl(x) * 127.0 / col("q_scale") + 0.5))))
  }

  /** Dequantize `q_vec` back to doubles: q_i * scale / 127. Max
    * per-element reconstruction error is scale/254 by construction.
    */
  def dequantize(df: DataFrame): DataFrame =
    df.withColumn("deq_vec",
      transform(col("q_vec"), q => dbl(q) * col("q_scale") / 127.0))

  /** Scalar oracle surface: (id, q_scale, q_l1, q_sum) — the L1 norm
    * and signed sum of the int8 vector are exact integers an external
    * engine recomputes from the same floor arithmetic, so any change to
    * scale selection or rounding flips the hard signal.
    */
  def quantizeStats(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    quantizeInt8(df.select(col(idCol), col(vecCol)), vecCol)
      .select(
        col(idCol),
        col("q_scale"),
        aggregate(col("q_vec"), lit(0L), (acc, q) => acc + abs(q)).as("q_l1"),
        aggregate(col("q_vec"), lit(0L), (acc, q) => acc + q).as("q_sum"))
}
