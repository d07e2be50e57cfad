package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def realDocs(n: Int) = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .limit(n)

  test("exact dedup collapses normalized duplicates, keeps min id") {
    val docs = Seq(
      (1L, "Hello   world foo"),
      (2L, "  hello world FOO "), // same after normalization
      (3L, "something else entirely")).toDF("doc_id", "text")
    val res = Dedup.exactDedup(docs).collect()
    assert(res.length == 2)
    val dup = res.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
    assert(Dedup.dropExactDuplicates(docs).count() == 2)
  }

  test("minhash LSH near-dup: recall on seeded perturbations, no false merges") {
    val rnd = new scala.util.Random(42)
    val base = realDocs(40).select($"doc_id", $"text").as[(Long, String)].collect()
    // Perturb ~2.5% of tokens of each doc -> shingle Jaccard ~0.85,
    // above the 16x8 banding S-curve threshold (1/16)^(1/8) ~ 0.71
    // where detection probability is >0.95.
    val perturbed = base.map { case (id, text) =>
      val toks = text.split("\\s+")
      val mutated = toks.map(t => if (rnd.nextDouble() < 0.025) "zzq" + t else t)
      (id + 100000L, mutated.mkString(" "))
    }
    val docs = (base ++ perturbed).toSeq.toDF("doc_id", "text")

    val pairs = Dedup.nearDuplicatePairs(docs, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // Recall: each (id, id+100000) pair should be found.
    val want = base.map { case (id, _) => (id, id + 100000L) }.toSet
    val found = want.intersect(pairs)
    assert(found.size >= (want.size * 0.85).toInt,
      s"recall too low: ${found.size}/${want.size}")
    // Precision: every extra pair (not seeded by us) must be a genuine
    // near-dup — the corpus does contain natural ones (e.g. docs 8/12).
    val textOf = (base ++ perturbed).toMap
    val extras = pairs.filterNot(p => p._2 - p._1 == 100000L)
    extras.foreach { case (a, b) =>
      val j = Dedup.jaccard(Dedup.shingleSet(textOf(a)), Dedup.shingleSet(textOf(b)))
      assert(j >= 0.5, s"false positive ($a,$b) with true jaccard $j")
    }
  }

  test("LSH candidate generation is bucket-bounded, not all-pairs") {
    val docs = realDocs(200).select($"doc_id", $"text")
    val sigs = Dedup.minhashSignatures(docs)
    val nCands = Dedup.lshCandidatePairs(sigs).count()
    // 200 distinct docs -> candidate count must be far below 200*199/2.
    assert(nCands < 500, s"LSH produced near-quadratic candidates: $nCands")
  }

  test("simhash: perturbed docs within Hamming 3, fingerprints deterministic") {
    val base = realDocs(30).select($"doc_id", $"text").as[(Long, String)].collect()
    val rnd = new scala.util.Random(7)
    val perturbed = base.map { case (id, text) =>
      val toks = text.split("\\s+")
      val i = rnd.nextInt(toks.length)
      (id + 100000L, toks.updated(i, "zzq").mkString(" "))
    }
    val docs = (base ++ perturbed).toSeq.toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDuplicates(docs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = base.map { case (id, _) => (id, id + 100000L) }.toSet
    val found = want.intersect(pairs)
    assert(found.size >= (want.size * 0.7).toInt, s"simhash recall: ${found.size}/${want.size}")

    // Determinism: same text -> same fingerprint.
    assert(Dedup.simhash("a b c") == Dedup.simhash("a b c"))
    assert(Dedup.simhash("hello world") != Dedup.simhash("goodbye world"))
  }

  test("simhash degenerate corpus: oversized buckets are dropped, not exploded") {
    // 400 IDENTICAL docs: every (segIdx, segVal) bucket holds all 400
    // fingerprints. Uncapped, that is 4 * C(400,2) = 319,200 candidate
    // rows from one key; with maxBucket the buckets are dropped before
    // pair generation, so the candidate set is empty by design.
    val boiler = (1L to 400L).map(i => (i, "the same boilerplate header text repeated verbatim"))
    val distinct = Seq((1001L, "a genuinely unique document about rivers and mountains"),
      (1002L, "a genuinely unique document about rivers and mountains"))
    val docs = (boiler ++ distinct).toDF("doc_id", "text")

    val capped = Dedup.simhashNearDuplicates(docs, maxDist = 3, maxBucket = 256)
    assert(capped.count() >= 1L) // the 1001/1002 near-pair survives in its own bucket
    assert(capped.filter($"doc_a" <= 400L).count() == 0L,
      "boilerplate bucket should have been dropped by maxBucket")

    // Cap admits the bucket when raised above its size — same pairs as
    // an uncapped run would produce, proving the cap is the only change.
    val admitted = Dedup.simhashNearDuplicates(docs, maxDist = 3, maxBucket = 500)
    assert(admitted.filter($"doc_a" <= 400L && $"doc_b" <= 400L).count() == 400L * 399L / 2L)
  }

  test("exact near-dup join equals driver-side all-pairs (100% recall by construction)") {
    val rnd = new scala.util.Random(99)
    val base = realDocs(60).select($"doc_id", $"text").as[(Long, String)].collect()
    val perturbed = base.take(20).map { case (id, text) =>
      val toks = text.split("\\s+")
      val mutated = toks.map(t => if (rnd.nextDouble() < 0.02) "zzq" + t else t)
      (id + 100000L, mutated.mkString(" "))
    }
    val all = base ++ perturbed
    val docs = all.toSeq.toDF("doc_id", "text")

    // Ground truth: brute-force all-pairs exact shingle Jaccard.
    val sh = all.map { case (id, t) => id -> Dedup.shingleSet(t) }.toMap
    val want = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = sa.intersect(sb).size
      union = sa.size + sb.size - inter
      if union > 0 && inter.toDouble >= union * 0.5
    } yield (a, b, inter.toLong, union.toLong)).toSet

    val got = Dedup.exactNearDuplicatePairs(docs, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_union")))
      .toSet
    assert(got == want,
      s"prefix-filter join != all-pairs: missing=${want -- got} extra=${got -- want}")

    // The LSH path is verify-filtered, so it can never exceed the exact
    // set; recall is only deterministic ABOVE the 16x8 banding knee
    // (J ~ 0.71), so full recall is asserted for J >= 0.75 pairs only.
    val lsh = Dedup.nearDuplicatePairCounts(docs, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_union")))
      .toSet
    assert(lsh.subsetOf(want), s"LSH false positives: ${lsh -- want}")
    val aboveKnee = want.filter { case (_, _, i, u) => i.toDouble >= u * 0.75 }
    assert(aboveKnee.subsetOf(lsh),
      s"LSH missed above-knee pairs: ${aboveKnee -- lsh}")
  }

  test("connected components: chains, cycles, multiple clusters, min rep") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain -> rep 1
      (10L, 11L), (11L, 12L), (12L, 10L), // cycle -> rep 10
      (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("union-find fast path == distributed label propagation on random graphs") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
    val fast = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Dedup.connectedComponents(pairs, smallGraphEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == dist)
  }

  test("star contraction == union-find on random graphs, handles cycles") {
    val rnd = new scala.util.Random(23)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
    val star = Dedup.starContractionComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uf = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == uf)
  }

  test("adversarial chain: label propagation budget exceeded -> star contraction solves it") {
    // Diameter-600 path graph: label propagation needs 600 rounds; the
    // distributed path (fast path disabled) hits its budget and falls
    // back to star contraction, which needs O(log^2 n).
    val chain = (0L until 600L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, maxRounds = 5, smallGraphEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L to 600L).map(i => (i, 0L)).toSet)
    // And directly: star contraction alone, same answer.
    val direct = Dedup.starContractionComponents(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct == got)
  }

  test("star contraction: empty pair graph returns empty, no crash") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.starContractionComponents(empty).isEmpty)
  }

  test("jaccard kernel") {
    assert(Dedup.jaccard(Set("a", "b"), Set("a", "b")) == 1.0)
    assert(Dedup.jaccard(Set("a", "b"), Set("b", "c")) == 1.0 / 3.0)
    assert(Dedup.jaccard(Set.empty, Set.empty) == 1.0)
  }

  test("fingerprint verify counts equal exact string-set counts on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup
      .exactNearDuplicatePairsFromShingles(Dedup.shingles(docs).localCheckpoint(), 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))).toMap
    assert(pairs.nonEmpty)
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    pairs.foreach { case ((a, b), (ni, nu)) =>
      val sa = Dedup.shingleSet(texts(a))
      val sb = Dedup.shingleSet(texts(b))
      val inter = sa.intersect(sb).size.toLong
      assert((ni, nu) == ((inter, sa.size + sb.size - inter)),
        s"hashed counts diverge from string sets for ($a,$b)")
    }
  }
}
