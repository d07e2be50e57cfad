package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for reproducible training
  * subsets.
  *
  * The selection order is a pure arithmetic function of the row id —
  * Knuth's multiplicative hash `(id * 2654435761) mod 2^32` — rather
  * than an engine RNG, so the EXACT same rows are chosen by any system
  * that can multiply integers (reproducible across Spark versions,
  * partitionings, and external engines; the oracle recomputes the full
  * selection). The multiplier is the classic golden-ratio constant
  * (Knuth TAOCP vol. 3 §6.4); consecutive ids land pseudo-uniformly in
  * [0, 2^32).
  *
  * Scale: `stratifiedTopK` is one shuffle on the stratum key (the
  * row_number window); `hashSample` is a pure filter — no shuffle, no
  * RNG state, prunes at the scan when the id predicate is pushable.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val M32 = 4294967296L

  /** The portable selection key: `(id * 2654435761) mod 2^32` computed
    * EXACTLY for every non-negative Long id. A naive `id * K` wraps Long
    * for ids >= ~2^31.7, silently breaking the engine-portable contract
    * right at the scale this targets — so the multiply is split:
    * mathematically `(id*K) mod 2^32` depends only on `id mod 2^32`,
    * and with `id32 = hi*2^16 + lo` the partial products
    * `hi*K < 2^48` and `lo*K < 2^48` both fit a Long. Negative ids
    * raise instead of silently hashing (pmod would happily return a
    * value no external engine recomputes the same way).
    */
  def hashKey(idCol: String): org.apache.spark.sql.Column = hashKeyOf(col(idCol))

  /** As [[hashKey]], over any id-valued Column (e.g. a derived cluster
    * representative). */
  def hashKeyOf(idExpr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val id = idExpr.cast("long")
    val id32 = pmod(id, lit(M32))
    val hi = shiftright(id32, 16)
    val lo = id32.bitwiseAND(lit(0xFFFFL))
    val key = pmod(pmod(hi * Knuth, lit(M32)) * 65536L + lo * Knuth, lit(M32))
    when(id.isNull, lit(null).cast("long"))
      .when(id >= 0, key)
      .otherwise(
        raise_error(concat(lit("Sampling.hashKey: negative id "), id.cast("string"))))
  }

  /** Per-EPOCH deterministic shuffle key: training runs want a
    * DIFFERENT document order every epoch, reproducibly. The key is
    * the portable Knuth hash of the epoch-salted id
    * (`((id mod 2^32) * 31 + epoch) * K mod 2^32` — the salt stays
    * under 2^38, and the multiply reuses [[hashKey]]'s hi/lo split, so
    * the whole arithmetic is exact in any 64-bit engine). Sorting by
    * (key, id) at write time gives the epoch's order; emitting the KEY
    * rather than a global rank keeps the operator shuffle-free — the
    * consumer's write is the one global sort, where it belongs.
    */
  def epochOrderKey(idCol: String, epoch: Int): org.apache.spark.sql.Column = {
    require(epoch >= 0, s"epoch >= 0: $epoch")
    val id = col(idCol).cast("long")
    val salted = pmod(pmod(id, lit(M32)) * 31L + epoch.toLong, lit(M32))
    val hi = shiftright(salted, 16)
    val lo = salted.bitwiseAND(lit(0xFFFFL))
    val key = pmod(pmod(hi * Knuth, lit(M32)) * 65536L + lo * Knuth, lit(M32))
    when(id.isNull, lit(null).cast("long"))
      .when(id >= 0, key)
      .otherwise(
        raise_error(concat(lit("Sampling.epochOrderKey: negative id "), id.cast("string"))))
  }

  /** `df` in its epoch-`epoch` training order (global sort by the
    * epoch key; ties broken by id).
    */
  def epochShuffled(df: DataFrame, idCol: String, epoch: Int): DataFrame =
    df.orderBy(epochOrderKey(idCol, epoch), col(idCol))

  /** Up to `k` rows per stratum, chosen by ascending hash order (ties
    * broken by id — total order, fully deterministic).
    */
  def stratifiedTopK(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(!df.columns.contains("__rk"), "input must not already carry a __rk column")
    val w = Window.partitionBy(col(stratumCol)).orderBy(hashKey(idCol), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Keep a deterministic ~`fraction` of rows: those whose hash key
    * falls below `fraction * 2^32`. A pure filter — at 100 TB this is
    * the sampling primitive that costs one scan and nothing else.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction in [0,1]: $fraction")
    df.filter(hashKey(idCol) < (fraction * M32).toLong)
  }

  /** Domain-mixture sampling: keep a per-domain deterministic fraction
    * of rows (the "20% web, 100% books, 5% logs" re-weighting step of a
    * training-data pipeline). Domains absent from `rates` fall back to
    * `defaultRate`. Selection per row is `hashKey(id) <
    * rate(domain) * 2^32` — the same portable formula as [[hashSample]],
    * so an external engine recomputes the exact member set. The rate
    * lookup folds into a literal CASE expression: one codegen'd filter
    * over the scan, no shuffle, no RNG, no join.
    */
  def mixtureSample(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      s"rates in [0,1]: $rates default=$defaultRate")
    // Sorted fold: Map iteration order must not leak into the plan.
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit((defaultRate * M32).toLong)) {
      case (acc, (dom, r)) => when(col(domainCol) === dom, lit((r * M32).toLong)).otherwise(acc)
    }
    df.filter(hashKey(idCol) < thr)
  }

  /** Mixture sampling WITH oversampling: rates above 1 REPEAT a domain
    * (epochs), the standard up-weighting move of training-mixture
    * recipes (a rate of 2.5 = two full copies of every doc plus the
    * deterministic 0.5 hash-subsample as a third). Output adds a
    * `copy` column (0-based epoch index) so downstream packing and
    * shuffling see distinct rows. Full copies keep every doc; the one
    * FRACTIONAL copy keeps exactly the [[mixtureSample]] subset for
    * the fractional rate — the same portable hash-threshold
    * arithmetic, so the whole expansion is engine-recomputable
    * (`q_mixture_epochs`).
    */
  def mixtureSampleRepeats(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0.0),
      s"rates >= 0: $rates default=$defaultRate")
    val maxCopies = math.ceil((rates.values ++ Seq(defaultRate)).max).toLong
    if (maxCopies == 0L)
      return df.withColumn("copy", lit(0L)).limit(0)
    // Per-row rate (sorted fold; Map order must not leak into the plan).
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (dom, r)) => when(col(domainCol) === dom, lit(r)).otherwise(acc)
    }
    // copy < floor(rate): full epoch. copy == floor(rate): fractional
    // epoch, kept when hashKey < frac * 2^32 (floor(rate * 2^32) -
    // floor(floor(rate) * 2^32) keeps the threshold arithmetic in the
    // exact integer domain the oracle replays).
    // Per-row sequence bound (not the global max) so a rate-0.1 domain
    // never fans out to a rate-3 domain's copy count; greatest(.,1)
    // guards sequence's descending-on-inverted-bounds behavior at
    // rate 0 (the filter then drops the lone copy).
    df.withColumn("__rate", rateCol)
      .withColumn("copy",
        explode(sequence(lit(0L), greatest(ceil(col("__rate")).cast("long"), lit(1L)) - 1L)))
      .filter(
        col("copy") < floor(col("__rate")) ||
          (col("copy") === floor(col("__rate")) &&
            hashKey(idCol) < (col("__rate") * M32).cast("long") - (floor(col("__rate")) * M32).cast("long")))
      .drop("__rate")
  }

  /** Deterministic train/validation/test split by hash-key range:
    * (label, row) with labels assigned by cumulative fraction bands.
    * Bands are disjoint and exhaustive, so every row appears exactly
    * once — reproducible splits without a shuffle.
    */
  def split(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitLabel(hashKey(idCol), fractions))

  private def splitLabel(
      key: org.apache.spark.sql.Column,
      fractions: Seq[(String, Double)]): org.apache.spark.sql.Column = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    fractions.zip(cuts).foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), rest) => when(key < (cut * M32).toLong, name).otherwise(rest)
    }
  }

  /** Leakage-free split: assign every NEAR-DUPLICATE CLUSTER to one
    * split atomically, so a test document can never have a
    * near-duplicate sitting in train — the contamination mode Lee et
    * al. (ACL'22) measure in public benchmarks, invisible to a plain
    * per-id split. `pairs` is any (doc_a, doc_b) near-dup pair frame
    * (LSH-verified, SimHash, SemDeDup — caller's choice of notion);
    * the cluster representative comes from
    * [[Dedup.connectedComponents]] and the WHOLE cluster takes the
    * representative's portable hash, so the member set of each split
    * is engine-recomputable. Singleton documents hash their own id —
    * identical to [[split]] for them.
    *
    * Scale shape: the components pass (label propagation / star
    * contraction — bounded rounds) plus ONE left join of the corpus to
    * the rep table; the label is a codegen'd expression.
    */
  def leakageFreeSplit(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    val reps = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("__lf_id"), col("rep_id"))
    df
      .join(reps, col(idCol).cast("long") === col("__lf_id"), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), col(idCol).cast("long")))
      .drop("__lf_id")
      .withColumn("split", splitLabel(hashKeyOf(col("rep_id")), fractions))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * per group, keep the k items with the largest `u^(1/w)` — the
    * exponential-race key that gives every item inclusion odds
    * proportional to its weight, the standard "sample k docs per
    * domain, quality-weighted" primitive. Deterministic end to end:
    * `u = (hashKey(id)+1) / (2^32+1)` (portable, in (0,1)), and the
    * key is compared in integer micro-nats `floor(ln(u)/w * 1e6 +
    * 0.5)` — the [[graft.ops.LanguageModel]] trick that makes libm
    * output engine-comparable — with id tie-breaks. Non-positive
    * weights are excluded (they cannot win a weighted race).
    *
    * Selection rides [[TopK.topKPerGroup]]'s bounded per-partition
    * heaps: O(parts · groups · k) rows reach the one shuffle, never
    * the corpus. Emits (groupCol, idCol, rank, score).
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    val u = (hashKey(idCol) + lit(1L)) / lit(4294967297.0)
    val score = floor(log(u) / col(weightCol).cast("double") * 1e6 + 0.5)
    val scored = df
      .where(col(weightCol) > 0)
      .withColumn("__ws_score", score)
    TopK.topKPerGroup(scored, groupCol, idCol, "__ws_score", k)
      .withColumnRenamed("group", groupCol)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("value", "score")
  }

  /** Per-group token-budget sampling: fill each group's budget with
    * documents in portable-hash order, keeping a document while its
    * group's budget is not yet exhausted — "give me ~1B tokens of web,
    * ~200M of code", the budget-shaped (rather than rate-shaped,
    * [[mixtureSample]]) way training mixtures are actually specified.
    * Deterministic and engine-recomputable: the fill order is
    * (hashKey(id), id) and the keep rule is `running_total_before <
    * budget`, so totals overshoot by at most one document and the
    * member set replays exactly in SQL with integer weights.
    *
    * One shuffle (the per-group window); budgets fold into a literal
    * CASE. Groups absent from `budgets` fall back to `defaultBudget`
    * (0 = drop).
    */
  def tokenBudgetSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0L),
      s"budgets must be non-negative: $budgets default=$defaultBudget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(hashKey(idCol), col(idCol))
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    // Weights are token counts — a negative or null one is corrupt data
    // that would silently shrink the running sum and over-admit past the
    // budget. Fail loudly ([[hashKeyOf]]'s discipline) instead.
    val wl = col(weightCol).cast("long")
    val checked = when(wl >= 0, wl).otherwise(raise_error(concat(
      lit(s"Sampling.tokenBudgetSample: negative or null $weightCol: "),
      coalesce(col(weightCol).cast("string"), lit("null")))))
    df
      .withColumn("__tb_w", checked)
      .withColumn("__cum_after", sum(col("__tb_w")).over(w))
      .where(col("__cum_after") - col("__tb_w") < budget)
      .drop("__tb_w", "__cum_after")
  }
}
