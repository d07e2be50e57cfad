package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._

/** Edit-distance join: the deletion-neighborhood candidate generator
  * is complete (brute-force parity on random short strings for k=1,2
  * across substitutions, insertions, deletions, transposition-as-2),
  * the verify step emits no false positives by construction, and the
  * bucket cap degrades loudly.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion neighborhood: size and membership for known strings") {
    val n1 = FuzzyJoin.deletionNeighborhood("abc", 1)
    assert(n1.toSet == Set("abc", "bc", "ac", "ab"))
    val n2 = FuzzyJoin.deletionNeighborhood("abcd", 2).toSet
    assert(n2.contains("abcd") && n2.contains("ab") && n2.contains("cd") && n2.contains("bd"))
    assert(FuzzyJoin.deletionNeighborhood("a", 2).toSet == Set("a", ""))
  }

  test("planted edits within k are found; beyond k are not (k=1)") {
    val catalog = Seq("small ring", "red widget", "blue bolt").toDF("name")
    val probes = Seq(
      "small rings", // 1 insertion
      "red widget",  // exact
      "blue blt",    // 1 deletion
      "smelly ring", // 3 edits from "small ring"
      "bolt blue"    // far from everything at k=1
    ).toDF("probe")
    val got = FuzzyJoin.editDistanceJoin(probes, catalog, "probe", "name", maxDist = 1)
    assert(got.droppedBuckets == 0L)
    val pairs = got.pairs.select("left_key", "right_key").as[(String, String)]
      .collect().toSet
    assert(pairs == Set(
      ("small rings", "small ring"),
      ("red widget", "red widget"),
      ("blue blt", "blue bolt")))
  }

  test("brute-force parity on random short strings, k = 1 and 2") {
    val rnd = new scala.util.Random(12021)
    val alphabet = "abcde"
    val strings = Vector.fill(120)(
      (0 until (3 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .distinct
    val df = strings.toDF("s")
    for (k <- Seq(1, 2)) {
      val expect = (for {
        a <- strings; b <- strings
        if a < b && lev(a, b) <= k
      } yield (a, b)).toSet
      val got = FuzzyJoin.nearMatches(df, "s", k, maxBucket = 100000)
      assert(got.droppedBuckets == 0L)
      val pairs = got.pairs.select("left_key", "right_key").as[(String, String)]
        .collect().toSet
      assert(pairs == expect, s"k=$k: got ${pairs.size}, want ${expect.size}")
    }
  }

  test("reported distances are the exact levenshtein distances") {
    val probes = Seq("kitten").toDF("a")
    val cat = Seq("sitten", "kitten", "kittens").toDF("b")
    val rows = FuzzyJoin.editDistanceJoin(probes, cat, "a", "b", maxDist = 2)
      .pairs.select("right_key", "dist").as[(String, Int)].collect().toMap
    assert(rows == Map("sitten" -> 1, "kitten" -> 0, "kittens" -> 1))
  }

  test("bucket cap drops degenerate variants loudly, not silently") {
    // 300 distinct keys "stem<c>" all share the deletion variant
    // "stem" at k=1: that bucket blows past the cap and is dropped,
    // and the drop is REPORTED.
    val many = (0 until 300).map(i => s"stem${(0x100 + i).toChar}").toDF("s")
    val r = FuzzyJoin.nearMatches(many, "s", maxDist = 1, maxBucket = 64)
    assert(r.droppedBuckets >= 1L)
  }

  test("right-side degenerate bucket is capped too (not just the left)") {
    // Left is a single short key; the blowup lives entirely on the
    // RIGHT: 300 keys sharing the variant "stem". A left-only cap
    // would join 1 x 300 through that bucket; the per-side cap drops
    // it from both sides and reports it.
    val left = Seq("stemX").toDF("a")
    val right = (0 until 300).map(i => s"stem${(0x100 + i).toChar}").toDF("b")
    val r = FuzzyJoin.editDistanceJoin(left, right, "a", "b", maxDist = 1, maxBucket = 64)
    assert(r.droppedBuckets >= 1L)
    // Pairs may only survive via a non-degenerate shared variant; the
    // shared-"stem" route is closed, and "stemX" shares no other
    // variant with any right key, so the result is empty.
    assert(r.pairs.count() == 0)
  }

  test("null keys are ignored, not erroring or matching") {
    val probes = Seq(Some("abc"), None).toDF("a")
    val cat = Seq("abc").toDF("b")
    val r = FuzzyJoin.editDistanceJoin(probes, cat, "a", "b", maxDist = 1)
    assert(r.pairs.count() == 1)
  }
}
