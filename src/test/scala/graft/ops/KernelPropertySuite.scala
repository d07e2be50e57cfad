package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties for the pure pair/packing kernels, driving the
  * exact functions the Spark paths call (no Spark session needed).
  */
class KernelPropertySuite extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("interUnionLong == set arithmetic on random sorted-distinct arrays") {
    for (_ <- 1 to 500) {
      val a = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong).distinct.sorted
      val (i, u) = Dedup.interUnionLong(a, b)
      val inter = a.toSet.intersect(b.toSet).size.toLong
      assert(i == inter && u == a.length + b.length - inter,
        s"mismatch for ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("interUnion (string) and interUnionLong (fingerprint) agree on random shingles") {
    for (_ <- 1 to 200) {
      val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
      def arr() = Array.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).distinct
      val sa = arr(); val sb = arr()
      val strRes = Dedup.interUnion(
        sa.sorted.toIndexedSeq, sb.sorted.toIndexedSeq)
      val hashRes = Dedup.interUnionLong(
        sa.map(Dedup.hash64).sorted, sb.map(Dedup.hash64).sorted)
      assert(strRes == hashRes)
    }
  }

  test("hash64 is injective over every shingle in the real corpora") {
    // Exhaustive on the synthetic vocabulary's shingle space: all
    // 3-shingles over the 31-token vocabulary (superset of what any sf
    // corpus can produce) — no 64-bit collisions anywhere.
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "part", "hash", "merge", "batch", "spark", "a", "the", "line", "sort",
      "window", "order", "data", "column", "join", "small", "customer", "query",
      "big", "stream", "group", "vector", "filter", "scan2")
    val shingles = for (x <- vocab; y <- vocab; z <- vocab) yield s"$x $y $z"
    val hashes = shingles.map(Dedup.hash64)
    assert(hashes.distinct.size == shingles.size, "hash collision in shingle space")
  }
}
