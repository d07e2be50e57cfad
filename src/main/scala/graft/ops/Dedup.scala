package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Document deduplication for large-scale training-data pipelines.
  *
  * Four tiers, all shuffle-bounded (never all-pairs):
  *   - exact: hash-groupBy on normalized text — one shuffle;
  *   - MinHash + banded LSH: candidate pairs only within band buckets,
  *     verified with exact shingle Jaccard;
  *   - SimHash: 64-bit fingerprint, candidates via 4-segment bucketing
  *     (any pair within Hamming distance 3 shares at least one exact
  *     16-bit segment — pigeonhole), verified with bit_count(xor);
  *   - n-gram Jaccard verification kernel shared by both.
  *
  * Scale: the only shuffles are groupBy(bucket) joins whose expected
  * bucket sizes are O(1) for non-duplicate corpora; `maxBucket` caps
  * pathological buckets (boilerplate explosions) with an explicit drop
  * instead of a quadratic blowup.
  */
/** One verified near-duplicate pair (top-level for the encoder). */
private[graft] final case class PairCount(
    doc_a: Long, doc_b: Long, n_inter: Long, n_union: Long)

object Dedup {

  /** Whitespace-collapsed, trimmed, lowercased text. Collapse BEFORE
    * trimming: SQL trim strips only spaces, so a trailing tab/newline
    * must first become a space or it would survive and distinguish
    * otherwise-identical documents. DuckDB-equivalent:
    * `lower(trim(regexp_replace(text, '\s+', ' ', 'g')))`; equals the
    * streaming kernel `StreamingDedup.fingerprint`'s Java
    * trim+split+mkString normalization for all inputs.
    */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Exact dedup: one row per distinct normalized text with its
    * duplicate count and the surviving (minimum) doc id.
    */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(normalizeText(col(textCol))).as("text_hash"))
      .agg(
        count(lit(1)).as("n_dups"),
        min(col(idCol)).as("keep_id"))

  /** Docs with normalized-duplicate rows removed (keep min id). One
    * `min_by(struct(*), id)` hash aggregation on the content hash:
    * map-side partial aggregation collapses every occurrence of a hot
    * key to ONE row per map task before the exchange, so a
    * mega-duplicated page (the exact thing exact dedup exists to find)
    * never serializes onto a single reduce task — unlike the previous
    * keep-min-rank window, whose `Window.partitionBy(hash)` sent all
    * 10^6 copies to one un-splittable WindowExec sort, and unlike
    * groupBy + join-back, which needed a second corpus shuffle. The
    * content key is also evaluated exactly once per row.
    */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cols = docs.columns
    docs
      .groupBy(md5(normalizeText(col(textCol))).as("__dd_key"))
      .agg(min_by(struct(cols.map(col).toIndexedSeq: _*), col(idCol)).as("__dd_row"))
      .select("__dd_row.*")
  }

  // ---------------------------------------------------------------- MinHash

  val NumHashes = 128
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  // Deterministic affine permutation parameters (fixed seed). Modulus is
  // the Mersenne prime 2^31-1 so a*h stays below 2^62 — no overflow, no
  // BigInt in the hot loop.
  private val P = 2147483647L // 2^31 - 1
  private[ops] val hashParams: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5eed5eedL)
    Array.fill(NumHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Word k-shingles of normalized text. */
  def shingleSet(text: String, k: Int = 3): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  /** MinHash signature of a shingle set: for each of the 128 affine
    * permutations, the minimum of (a*h(x)+b) mod p over shingles.
    */
  def signature(shingles: Set[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val h = (MurmurHash3.stringHash(s).toLong & 0xFFFFFFFFL) % P
      var i = 0
      while (i < NumHashes) {
        val (a, b) = hashParams(i)
        val m = (a * h + b) % P
        if (m < sig(i)) sig(i) = m
        i += 1
      }
    }
    sig
  }

  /** (doc_id, sig: Array[Long]) per document. */
  def minhashSignatures(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id", k: Int = 3): DataFrame = {
    val sigUdf = udf((text: String) => signature(shingleSet(text, k)))
    docs.select(col(idCol).as("doc_id"), sigUdf(col(textCol)).as("sig"))
  }

  /** [[minhashSignatures]] from a prebuilt [[shingles]] frame
    * ((doc_id, sh, ...)): signature values are IDENTICAL (each
    * permutation's min is set-order-independent and `sh` is the
    * distinct shingle set), so a caller that also persists the shingle
    * table pays the shingle extraction pass once instead of twice.
    */
  def minhashFromShingles(sh: DataFrame): DataFrame = {
    val sigUdf = udf((shArr: Seq[String]) => signature(shArr.toSet))
    sh.select(col("doc_id"), sigUdf(col("sh")).as("sig"))
  }

  /** Candidate pairs from banded LSH: two docs are candidates iff they
    * agree on all rows of at least one band. Only intra-bucket pairs are
    * generated; buckets above `maxBucket` are dropped (logged via the
    * `dropped_buckets` accumulator pattern is overkill here — they are
    * simply excluded) rather than exploded quadratically.
    */
  /** (doc_id, band, bucket) rows of the banded LSH index — one row per
    * (doc, band). Public so cross-corpus candidate joins (e.g. the
    * streaming curation state) share the exact bucket structure of
    * [[lshCandidatePairs]].
    */
  def bandBuckets(sigs: DataFrame): DataFrame = {
    val bandHash = udf((sig: Seq[Long], band: Int) =>
      MurmurHash3.arrayHash(sig.slice(band * RowsPerBand, (band + 1) * RowsPerBand).toArray))
    sigs
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(Bands - 1))).as("band"))
      .select(col("doc_id"), col("band"), bandHash(col("sig"), col("band")).as("bucket"))
  }

  def lshCandidatePairs(sigs: DataFrame, maxBucket: Int = 64): DataFrame = {
    bandBuckets(sigs)
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        "flatten(transform(ids, a -> transform(filter(ids, b -> b > a), b -> named_struct('a', a, 'b', b))))")).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two shingle sets. */
  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.intersect(b).size.toDouble
      inter / (a.size + b.size - inter)
    }
  }

  /** FNV-1a 64-bit over UTF-8 bytes — the shingle fingerprint the
    * verify kernels intersect instead of strings.
    */
  private[ops] def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** (doc_id, sh, shh): `sh` = the doc's SORTED shingle array, `shh` =
    * the SORTED distinct 64-bit shingle fingerprints, both computed
    * once per doc. Verification kernels intersect the primitive `shh`
    * arrays — a linear merge of unboxed longs instead of per-pair
    * string comparisons (and instead of the original re-tokenize-per-
    * pair, which was O(doclen) hashing per candidate). Count exactness:
    * a deviation from string-set counts requires two distinct shingles
    * of the SAME document pair colliding in 64 bits (P ≈ d²/2⁻⁶⁴ per
    * pair, ~1e-16 at 100-shingle docs); the DuckDB oracle cross-checks
    * exact string-set counts on every verify run.
    */
  private def shingleArrays(texts: DataFrame, k: Int): DataFrame = {
    val shUdf = udf { (text: String) =>
      val set = shingleSet(text, k)
      val s = set.toArray
      java.util.Arrays.sort(s, Ordering[String])
      val h = set.iterator.map(hash64).toArray.distinct
      java.util.Arrays.sort(h)
      (s, h)
    }
    texts.select(col("doc_id"), shUdf(col("text")).as("p"))
      .select(col("doc_id"), col("p._1").as("sh"), col("p._2").as("shh"))
  }

  /** Public precomputed-shingle surface: callers running SEVERAL
    * dedup/verify passes over one corpus (e.g. a simhash containment
    * check against the exact pair set) compute this once — ideally
    * `.localCheckpoint()`ed — and feed it to the `*FromShingles`
    * variants, instead of paying the shingling UDF once per pipeline.
    */
  def shingles(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id", k: Int = 3): DataFrame =
    shingleArrays(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), k)

  /** Merge-intersection of two pre-sorted shingle arrays:
    * (n_inter, n_union) in O(|a| + |b|) comparisons.
    */
  private[ops] def interUnion(a: IndexedSeq[String], b: IndexedSeq[String]): (Long, Long) = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    (inter, a.length.toLong + b.length - inter)
  }

  /** [[interUnion]] over pre-sorted primitive fingerprint arrays. */
  private[ops] def interUnionLong(a: Array[Long], b: Array[Long]): (Long, Long) = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    (inter, a.length.toLong + b.length - inter)
  }

  /** Near-duplicate pairs: banded-LSH candidates verified with exact
    * n-gram Jaccard >= threshold. Output (doc_a, doc_b, jaccard).
    */
  def nearDuplicatePairs(
      docs: DataFrame,
      threshold: Double = 0.8,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3): DataFrame = {
    val sigs = minhashSignatures(docs, textCol, idCol, k)
    val cands = lshCandidatePairs(sigs)
    val sh = shingleArrays(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), k)
    verifyWithShingles(cands, sh, threshold)
      .select(col("doc_a"), col("doc_b"),
        when(col("n_union") === 0L, 1.0)
          .otherwise(col("n_inter").cast("double") / col("n_union")).as("jaccard"))
  }

  /** As [[nearDuplicatePairs]] but with decimally-exact evidence:
    * (doc_a, doc_b, n_inter, n_union) — the shingle-set intersection and
    * union SIZES instead of their ratio. Integer set sizes let an
    * external engine reproduce rows exactly (no FP-division rounding in
    * the comparison), and verify the shingle sets themselves, not just
    * the threshold decision. Threshold filter is the integer form
    * n_inter >= threshold * n_union (exact for dyadic thresholds).
    */
  def nearDuplicatePairCounts(
      docs: DataFrame,
      threshold: Double = 0.8,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3): DataFrame =
    verifyPairCounts(
      lshCandidatePairs(minhashSignatures(docs, textCol, idCol, k)),
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      threshold, k)

  /** SimHash candidate pairs (Hamming <= maxDist) re-verified by exact
    * shingle Jaccard — the oracle-facing form of the SimHash path: its
    * output is a pure function of the corpus (an external engine can
    * recompute it as "all pairs with Jaccard >= threshold"), while its
    * RECALL depends on SimHash catching every such pair within maxDist,
    * so a degraded fingerprint shows up as missing rows.
    */
  def simhashVerifiedPairCounts(
      docs: DataFrame,
      threshold: Double = 0.8,
      maxDist: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3): DataFrame =
    verifyPairCounts(
      simhashNearDuplicates(docs, maxDist).select(col("doc_a"), col("doc_b")),
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      threshold, k)

  /** EXACT near-duplicate pair search via prefix-filtered inverted-index
    * self-join (Bayardo et al., "Scaling Up All Pairs Similarity
    * Search", WWW 2007; Chaudhuri et al. SSJoin): order each document's
    * shingles by ascending global document frequency (rarest first) and
    * index only the first |x| - ceil(t*|x|) + 1 of them — any pair with
    * Jaccard >= t provably shares at least one prefix shingle, so
    * candidate generation is 100%-recall WITHOUT all-pairs. Prefix
    * tokens are the RAREST shingles, so inverted-list buckets stay O(1)
    * on non-degenerate corpora and the join never explodes — this is
    * the exact-dedup scale path where MinHash's probabilistic recall is
    * not acceptable. Output (doc_a, doc_b, n_inter, n_union).
    */
  def exactNearDuplicatePairs(
      docs: DataFrame,
      threshold: Double = 0.8,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3): DataFrame =
    exactNearDuplicatePairsFromShingles(shingles(docs, textCol, idCol, k), threshold)

  /** [[exactNearDuplicatePairs]] over a precomputed [[shingles]] frame
    * (the shingle arrays feed BOTH the prefix index and the verify
    * kernel, so a materialized input is shingled once total).
    */
  def exactNearDuplicatePairsFromShingles(shArr: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    // Shingle-set size rides along from the array (size(sh)) — it used
    // to be recomputed as a second, unordered window pass over the
    // whole exploded shingle table.
    val sh = shArr
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"), explode(col("sh")).as("shingle"))
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = sh
      .join(df, "shingle")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold) + 1)
      .select(col("shingle"), col("doc_id"), col("n"))
    // Size-ratio prune (Bayardo §3): J(a,b) >= t forces
    // t*|b| <= |a| <= |b|/t, so incompatible sizes never even form a
    // candidate pair — this is what keeps the inverted-list self-join
    // subquadratic on size-diverse corpora.
    val cands = prefix.as("a").join(prefix.as("b"), "shingle")
      .filter(col("a.doc_id") < col("b.doc_id") &&
        col("a.n") >= col("b.n") * threshold && col("b.n") >= col("a.n") * threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyWithShingles(cands, shArr, threshold)
  }

  /** Shared verification kernel: join candidate pairs to per-doc sorted
    * shingle arrays (one shingling pass per doc, not per pair) and keep
    * those with exact shingle Jaccard >= threshold, reported as integer
    * (n_inter, n_union) from a linear merge-intersection.
    */
  private def verifyPairCounts(
      cands: DataFrame, texts: DataFrame, threshold: Double, k: Int): DataFrame =
    verifyWithShingles(cands, shingleArrays(texts, k), threshold)

  /** [[verifyPairCounts]] over a precomputed [[shingles]] frame. The
    * kernel is a typed mapPartitions over (pair, shh_a, shh_b): the
    * fingerprint arrays arrive as primitive long[] through the encoder
    * (one bulk copy each), and the merge-intersection runs unboxed —
    * profiling showed the old string-array UDF spent its time
    * deserializing and comparing boxed strings per pair, ~10x the cost
    * of the arithmetic.
    */
  def verifyWithShingles(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("shh").as("ha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shh").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions { it =>
        it.flatMap { case (a, b, ha, hb) =>
          val (inter, union) = interUnionLong(ha, hb)
          if (inter.toDouble >= union * threshold) Some(PairCount(a, b, inter, union))
          else None
        }
      }
      .toDF("doc_a", "doc_b", "n_inter", "n_union")
  }

  /** Connected components of a near-duplicate pair graph:
    * (doc_id, rep_id) with rep = the minimum id reachable through
    * pairs — duplicate-cluster representative selection, the step that
    * turns pairwise near-dup evidence into a keep/drop decision.
    *
    * Min-label propagation: each round every node takes the minimum
    * label in its neighborhood (one join + one groupBy per round),
    * stopping when a round changes nothing. Rounds needed = graph
    * diameter — duplicate clusters are shallow in practice (pairs share
    * a common template), so this converges in a few rounds; a graph
    * with adversarial long chains would call for star-contraction
    * (Kiveris et al., "Connected Components in MapReduce", SoCC 2014),
    * which halves diameter per round at the cost of a more complex
    * join pattern.
    */
  def connectedComponents(
      pairs: DataFrame, maxRounds: Int = 50, smallGraphEdges: Long = 500000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .persist()
    // Adaptive execution: near-dup pair graphs are usually tiny relative
    // to their corpus (dedup found FEW duplicates, or the corpus was
    // already clean). Below the threshold a driver-side union-find
    // answers in milliseconds instead of diameter-many distributed
    // rounds of two actions each; the label-propagation path below
    // remains the at-scale shape. Both produce rep = min reachable id,
    // bit-identical. Driver footprint at the default 500k edges: the
    // collected boxed-tuple array plus a HashMap of up to 1M boxed Long
    // entries — roughly 100-200 MB transient, safe on a default driver
    // (the raw-long arithmetic undercounts boxing ~5-10x, so the
    // threshold budgets for the boxed reality).
    val nEdges = edges.count()
    if (nEdges <= smallGraphEdges) {
      try {
        val parent = collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
          r
        }
        edges.as[(Long, Long)].collect().foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
        }
        val rows = parent.keysIterator.map(n => (n, find(n))).toSeq
        return spark.createDataset(rows).toDF("doc_id", "rep_id")
      } finally edges.unpersist()
    }
    var labels = edges.select($"a".as("doc_id")).distinct()
      .withColumn("rep_id", $"doc_id")
      .persist()
    try {
      var round = 0
      var converged = maxRounds == 0
      while (round < maxRounds && !converged) {
        val next = edges
          .join(labels.withColumnRenamed("doc_id", "b").withColumnRenamed("rep_id", "nbr"), "b")
          .groupBy($"a".as("doc_id"))
          .agg(min($"nbr").as("nbr_min"))
          .join(labels, "doc_id")
          .select($"doc_id", least($"rep_id", $"nbr_min").as("rep_id"))
          .persist()
        converged = next.join(labels.withColumnRenamed("rep_id", "old"), "doc_id")
          .filter($"rep_id" =!= $"old").isEmpty
        labels.unpersist()
        labels = next
        round += 1
      }
      // A silently-truncated propagation would split one true cluster
      // into several with no symptom. Min-label propagation needs
      // diameter-many rounds; an adversarial chain graph would exceed
      // any fixed budget — hand those to star-contraction, which
      // contracts the diameter geometrically (O(log^2 n) rounds).
      if (!converged) {
        labels.unpersist(blocking = false)
        return starContractionComponents(pairs)
      }
      // Hand back an RDD-persisted localCheckpoint instead of the
      // CacheManager-persisted iterate: checkpoint blocks are released
      // by the ContextCleaner once the returned frame is garbage
      // collected, so callers that never unpersist (bench loops) no
      // longer accumulate cached label tables. Eager: materializes from
      // the still-cached iterate, and truncates the 2-joins-per-round
      // lineage so downstream actions don't replay the loop.
      val out = labels.localCheckpoint(eager = true)
      labels.unpersist(blocking = false)
      out
    } finally edges.unpersist()
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC 2014):
    * the at-scale path for graphs whose DIAMETER defeats min-label
    * propagation (a duplicate chain a-b-c-...-z needs diameter-many
    * label rounds but only O(log^2 n) star rounds).
    *
    * Each round applies large-star (every node's larger neighbors
    * re-attach to its minimum neighbor) then small-star (every node's
    * smaller neighbors and itself re-attach to its minimum smaller
    * neighbor); both are one groupBy + one join — NO per-node
    * neighborhood arrays, so a high-degree hub never materializes its
    * adjacency in one row. At the fixed point the edge set is a star
    * forest: every node's minimum neighbor IS its component minimum.
    *
    * Output (doc_id, rep_id), bit-identical to [[connectedComponents]]
    * on any input — `DedupSpec` proves parity — and the automatic
    * fallback when label propagation exhausts its round budget.
    */
  def starContractionComponents(pairs: DataFrame, maxRounds: Int = 60): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select($"v".as("u"), $"u".as("v")))
      val m = nbrs.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      nbrs.join(m, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v")
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val d = e.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .filter($"u" =!= $"v")
      val m = d.groupBy($"u").agg(min($"v").as("m"))
      val withM = d.join(m, "u")
      withM.select($"v".as("a"), $"m".as("b"))
        .union(withM.select($"u".as("a"), $"m".as("b")))
        .filter($"a" =!= $"b")
        .distinct()
        .select($"a".as("u"), $"b".as("v"))
    }

    var edges = pairs
      .select(col("doc_a").cast("long").as("u"), col("doc_b").cast("long").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint(eager = true)
    var round = 0
    var converged = edges.isEmpty
    while (round < maxRounds && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = true)
      // Exact convergence test (two bounded actions) — a hash-sum
      // shortcut could falsely converge and silently split a cluster.
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      round += 1
    }
    if (!converged && round >= maxRounds)
      throw new IllegalStateException(
        s"starContractionComponents did not converge in $maxRounds rounds " +
          "(theoretical bound is O(log^2 n) — this indicates a bug, not a big graph)")
    // Star forest: rep(u) = min(neighbors(u) ∪ {u}); the component min
    // maps to itself.
    val sym = edges.union(edges.select($"v".as("u"), $"u".as("v")))
    sym.groupBy($"u").agg(least(min($"v"), first($"u")).as("rep_id"))
      .select($"u".as("doc_id"), $"rep_id")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens (unit weights). */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      val h = (MurmurHash3.stringHash(tok).toLong << 32) |
        (MurmurHash3.stringHash(tok.reverse).toLong & 0xFFFFFFFFL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** (doc_id, simhash) per document. */
  def simhashFingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = udf((t: String) => simhash(t))
    docs.select(col(idCol).as("doc_id"), sh(col(textCol)).as("simhash"))
  }

  /** Near-duplicate pairs by SimHash: Hamming distance <= maxDist.
    * Pigeonhole bucketing: with 4 segments of 16 bits, any pair at
    * distance <= 3 matches exactly on >= 1 segment — so candidates are
    * the intra-bucket pairs of (segment-index, segment-value) buckets.
    */
  def simhashNearDuplicates(docs: DataFrame, maxDist: Int = 3, maxBucket: Int = 256): DataFrame =
    hammingNearDuplicates(simhashFingerprints(docs).select(col("doc_id"), col("simhash")),
      maxDist, maxBucket)

  /** Generic 64-bit Hamming near-duplicate join over any fingerprint
    * frame `(doc_id, <fpCol>)` — the 4×16-bit segment bucketing behind
    * [[simhashNearDuplicates]], shared with [[MediaDedup]]'s
    * perceptual dHash (any ≤3-bit-distant pair agrees on at least one
    * segment by pigeonhole). Emits (doc_a, doc_b, dist), doc_a < doc_b.
    */
  def hammingNearDuplicates(fingerprints: DataFrame, maxDist: Int = 3, maxBucket: Int = 256): DataFrame = {
    require(maxDist <= 3, "4-segment bucketing covers Hamming distance <= 3")
    require(maxBucket >= 2, s"maxBucket must admit at least one pair: $maxBucket")
    val fpCol = fingerprints.columns(1)
    val fps = fingerprints.select(col(fingerprints.columns.head).as("doc_id"),
      col(fpCol).as("simhash"))
    val seg = udf((fp: Long, i: Int) => (fp >>> (16 * i)) & 0xFFFFL)
    // One groupBy per (segment-index, segment-value) bucket; buckets above
    // `maxBucket` are DROPPED before pair generation — a boilerplate-heavy
    // corpus where thousands of docs share a 16-bit segment would otherwise
    // self-join quadratically on that one key. Pairs are generated inside
    // the bucket row (array transform), so the candidate set is bounded by
    // maxBucket^2 per bucket by construction, never by the join planner.
    fps
      .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("segIdx"))
      .withColumn("segVal", seg(col("simhash"), col("segIdx")))
      .groupBy(col("segIdx"), col("segVal"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(expr(
        "flatten(transform(members, a -> transform(filter(members, b -> b.doc_id > a.doc_id), " +
          "b -> named_struct('doc_a', a.doc_id, 'fp_a', a.simhash, 'doc_b', b.doc_id, 'fp_b', b.simhash))))")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        bit_count(col("p.fp_a").bitwiseXOR(col("p.fp_b"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }
}
