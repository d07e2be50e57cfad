package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Welford online mean/variance — the reference's stream statistics
  * (`/root/reference/stats/welford.go:5-54`), re-expressed as a typed
  * Spark `Aggregator` so it runs distributed with partial + final
  * aggregation (single-pass `Update` on executors, Chan-et-al parallel
  * `merge` across partitions).
  */
final case class WelfordState(count: Long, mean: Double, m2: Double) {
  def update(value: Double): WelfordState = {
    val n = count + 1
    val delta = value - mean
    val m = mean + delta / n
    WelfordState(n, m, m2 + delta * (value - m))
  }

  /** Chan/Golub/LeVeque pairwise combination — exact merge of two
    * partial Welford states.
    */
  def merge(o: WelfordState): WelfordState = {
    if (count == 0) o
    else if (o.count == 0) this
    else {
      val n = count + o.count
      val delta = o.mean - mean
      WelfordState(
        n,
        mean + delta * o.count / n,
        m2 + o.m2 + delta * delta * count.toDouble * o.count / n)
    }
  }

  // Accessor semantics mirror the reference exactly (0 below 2 samples).
  def variance: Double = if (count < 2) 0.0 else m2 / count
  def sampleVariance: Double = if (count < 2) 0.0 else m2 / (count - 1)
  def sd: Double = math.sqrt(sampleVariance)
  def cv: Double = if (count < 2) 0.0 else sd / mean
}

object WelfordState {
  val zero: WelfordState = WelfordState(0L, 0.0, 0.0)
}

final case class WelfordResult(
    count: Long, mean: Double, variance: Double, sample_variance: Double, sd: Double, cv: Double)

class WelfordAggregator extends Aggregator[Double, WelfordState, WelfordResult] {
  def zero: WelfordState = WelfordState.zero
  def reduce(b: WelfordState, a: Double): WelfordState = b.update(a)
  def merge(a: WelfordState, b: WelfordState): WelfordState = a.merge(b)
  def finish(r: WelfordState): WelfordResult =
    WelfordResult(r.count, r.mean, r.variance, r.sampleVariance, r.sd, r.cv)
  def bufferEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
  def outputEncoder: Encoder[WelfordResult] = Encoders.product[WelfordResult]
}

object Welford {
  /** Column form: `welford(col)` usable inside `agg(...)`. */
  def welford(c: Column): Column = udaf(new WelfordAggregator).apply(c)
}
