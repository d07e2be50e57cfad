package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash join shuffles both sides on the key, so one hot key lands on
  * one task; AQE's skew-join split handles plain sort-merge joins but
  * not every downstream shape (e.g. when the join feeds a groupBy on
  * the same key, or the planner picked a non-splittable exchange).
  * Salting is the explicit fix: the BIG side's key becomes
  * (key, salt ∈ [0, salts)) with a deterministic per-row salt, the
  * SMALL side is exploded `salts`-fold, and the join key is the pair —
  * the hot key's rows spread over `salts` tasks by construction.
  *
  * The salt is deterministic (re-runs produce identical partitioning —
  * no RNG in the plan, which matters for shuffle-retry correctness):
  * `xxhash64(idCol) mod salts` when a unique/high-cardinality row id is
  * given (cheap, and immune to duplicate payloads), else
  * `xxhash64(whole row) mod salts` — note the fallback co-salts fully
  * identical rows, so prefer passing `idCol`. Cost: the small side is
  * duplicated `salts` times — keep `salts` modest (8-64) and the small
  * side small, exactly the regime where skew hurts.
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16,
      idCol: Option[String] = None): DataFrame = {
    require(salts >= 1, s"salts >= 1: $salts")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val saltSource = idCol match {
      case Some(id) => xxhash64(col(id))
      case None     => xxhash64(big.columns.map(col): _*)
    }
    val saltedBig = big.withColumn("__salt", pmod(saltSource, lit(salts)))
    val explodedSmall = small.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig
      .join(explodedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
