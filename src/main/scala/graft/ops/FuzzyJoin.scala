package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string join — the entity-resolution primitive
  * (product names, author strings, URLs after canonicalization): all
  * (left, right) pairs with `levenshtein <= maxDist`, without the
  * cross product.
  *
  * Candidate generation is the FastSS deletion neighborhood
  * (Bocek et al., 2007): every string explodes into its variants with
  * up to k characters deleted, and `ed(a, b) <= k` implies the two
  * neighborhoods share an element — so an equi-join on the variant
  * hash is a COMPLETE candidate generator, and the exact
  * `levenshtein` verify trims the superset. Designed for SHORT keys
  * (k <= 2, length <= ~50): the neighborhood is C(len, k) variants
  * per row (len 20, k 2 → 211), which is the documented cost knob —
  * for whole documents use [[SubstringDedup]]/[[Dedup]] instead, this
  * is the wrong tool there.
  *
  * 100 TB shape: explode → one equi-join on an 8-byte hash →
  * pair-level distinct → codegen'd levenshtein verify. `maxBucket`
  * caps a variant bucket the way every candidate generator here does
  * (LSH bands, SimHash segments): degenerate variants (e.g. the empty
  * string from len <= k keys, a stop-word shared by everything) would
  * otherwise go quadratic; dropped buckets lose only pairs whose
  * EVERY shared variant is degenerate, and loudly (`droppedBuckets`
  * is part of the result).
  */
object FuzzyJoin {

  /** All distinct strings obtainable from `s` by deleting at most `k`
    * characters (including `s` itself). C(len, k) entries.
    */
  private[graft] def deletionNeighborhood(s: String, k: Int): Seq[String] = {
    val out = collection.mutable.LinkedHashSet(s)
    var frontier = Set(s)
    var i = 0
    while (i < k) {
      frontier = frontier.flatMap(v =>
        (0 until v.length).iterator.map(j => v.substring(0, j) + v.substring(j + 1)))
      out ++= frontier
      i += 1
    }
    out.toVector
  }

  /** Join result frame plus the count of variant buckets dropped by
    * `maxBucket` (0 = the candidate set was provably complete).
    */
  final case class Result(pairs: DataFrame, droppedBuckets: Long)

  /** All (leftCol, rightCol) pairs with `levenshtein <= maxDist`,
    * emitted as (left_key, right_key, dist) over the DISTINCT key
    * strings of each side. Self-join callers pass the same frame
    * twice and filter `left_key < right_key`.
    */
  def editDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int,
      maxBucket: Int = 256): Result = {
    require(maxDist >= 0 && maxDist <= 3,
      s"deletion neighborhoods are for small k (0..3): $maxDist")
    val spark = left.sparkSession
    import spark.implicits._
    val k = maxDist
    val neigh = udf((s: String) =>
      if (s == null) Seq.empty[String] else deletionNeighborhood(s, k))

    def variants(df: DataFrame, c: String, out: String): DataFrame =
      df.select(col(c).as(out)).where(col(out).isNotNull).distinct()
        .select(col(out), explode(neigh(col(out))).as("__fz_v"))
        .select(col(out), xxhash64(col("__fz_v")).as("__fz_key"))
        .distinct()

    val lv = variants(left, leftCol, "left_key")
    val rv = variants(right, rightCol, "right_key")

    // A degenerate bucket on EITHER side makes the candidate join
    // quadratic (e.g. the empty-string variant of len <= k keys can be
    // huge on the right even when rare on the left), so the cap is
    // enforced per side and a bucket over it on either side is dropped
    // from both. The dropped set is tiny by construction (only buckets
    // past the cap), so both anti-joins broadcast.
    def oversize(v: DataFrame): DataFrame =
      v.groupBy($"__fz_key").agg(count(lit(1)).as("__fz_n"))
        .where($"__fz_n" > maxBucket).select($"__fz_key")
    val dropped = oversize(lv).union(oversize(rv)).distinct()
    val droppedCount = dropped.count()
    val keptL = lv.join(broadcast(dropped), Seq("__fz_key"), "left_anti")
    val keptR = rv.join(broadcast(dropped), Seq("__fz_key"), "left_anti")

    val pairs = keptL.join(keptR, "__fz_key")
      .select($"left_key", $"right_key").distinct()
      .withColumn("dist", levenshtein($"left_key", $"right_key"))
      .where($"dist" <= k)
    Result(pairs, droppedCount)
  }

  /** Self near-match pairs within one frame's key column:
    * (left_key, right_key, dist), left < right lexicographically.
    */
  def nearMatches(
      df: DataFrame, keyCol: String, maxDist: Int, maxBucket: Int = 256): Result = {
    val r = editDistanceJoin(df, df, keyCol, keyCol, maxDist, maxBucket)
    Result(r.pairs.where(col("left_key") < col("right_key")), r.droppedBuckets)
  }
}
