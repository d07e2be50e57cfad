package graft

import graft.functions.{QSketch, QuantileSketch}
import graft.ops.Similarity
import org.apache.spark.SparkConf
import org.apache.spark.serializer.KryoSerializer
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Focused parity contracts for the r16 operator-internal rewrites —
  * each optimization that changed HOW a quantity is computed gets its
  * old definition re-derived here and compared exactly (the
  * [[OptimizationParitySpec]] discipline).
  */
class OptimizationParityR16Spec extends SparkSpec {
  import spark.implicits._

  // ---- QSketch: primitive level-1 fast path + KryoSerializable ----

  /** The r15 map-backed compaction, re-derived: a reference sketch that
    * mirrors the old per-level ArrayBuffer discipline bit for bit —
    * the rewritten QSketch must reproduce its retained multiset, n,
    * err and wire bytes for any add/merge sequence.
    */
  private final class RefSketch(val k: Int) {
    val levels = collection.mutable.HashMap.empty[Long, collection.mutable.ArrayBuffer[Double]]
    val flips = collection.mutable.HashMap.empty[Long, Boolean]
    var n = 0L
    var err = 0L
    def add(v: Double): Unit = {
      levels.getOrElseUpdate(1L, collection.mutable.ArrayBuffer.empty) += v
      n += 1L
      compressFrom(1L)
    }
    def merge(o: RefSketch): Unit = {
      o.levels.foreach { case (w, buf) =>
        levels.getOrElseUpdate(w, collection.mutable.ArrayBuffer.empty) ++= buf
      }
      n += o.n; err += o.err
      levels.keys.toArray.sorted.foreach(compressFrom)
    }
    private def compressFrom(w0: Long): Unit = {
      var w = w0
      while (levels.get(w).exists(_.length > k)) {
        val buf = levels(w)
        val arr = buf.toArray
        java.util.Arrays.sort(arr)
        val keepSecond = flips.getOrElse(w, false)
        flips(w) = !keepSecond
        val off = if (keepSecond) 1 else 0
        val odd = arr.length % 2 == 1
        val up = levels.getOrElseUpdate(2L * w, collection.mutable.ArrayBuffer.empty)
        var i = 0
        val pairs = arr.length / 2
        while (i < pairs) { up += arr(2 * i + off); i += 1 }
        buf.clear()
        if (odd) buf += arr(arr.length - 1)
        err += w
        w = 2L * w
      }
    }
    /** Old toBytes, verbatim over the map. */
    def bytes: Array[Byte] = {
      val nVals = levels.valuesIterator.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(
        4 + 4 + 8 + 8 + 4 + levels.size * (8 + 1 + 4) + nVals * 8)
      buf.putInt(0x51534b31).putInt(k).putLong(n).putLong(err).putInt(levels.size)
      levels.toArray.sortBy(_._1).foreach { case (w, vs) =>
        buf.putLong(w)
        buf.put(if (flips.getOrElse(w, false)) 1.toByte else 0.toByte)
        buf.putInt(vs.length)
        vs.foreach(buf.putDouble)
      }
      buf.array()
    }
  }

  test("QSketch primitive fast path: wire bytes identical to the map-backed r15 sketch") {
    val rnd = new Random(7)
    for (k <- Seq(8, 16, 32); n <- Seq(0, 1, 7, 100, 5000)) {
      val vals = Array.fill(n)(rnd.nextDouble() * 100.0)
      val s = new QSketch(k); val r = new RefSketch(k)
      vals.foreach { v => s.add(v); r.add(v) }
      assert(s.n == r.n && s.err == r.err, s"k=$k n=$n counters")
      assert(java.util.Arrays.equals(QuantileSketch.toBytes(s), r.bytes),
        s"k=$k n=$n wire bytes diverged")
    }
  }

  test("QSketch merge trees: bytes identical to the r15 sketch through unbalanced merges") {
    val rnd = new Random(13)
    val chunks = Array.fill(9)(Array.fill(rnd.nextInt(900))(rnd.nextDouble() * 50.0))
    def buildNew = chunks.map { c => val s = new QSketch(16); c.foreach(s.add); s }
    def buildRef = chunks.map { c => val s = new RefSketch(16); c.foreach(s.add); s }
    // unbalanced left fold, then a serialize round-trip mid-merge
    val sNew = buildNew.reduce { (a, b) => a.merge(b); a }
    val sRef = buildRef.reduce { (a, b) => a.merge(b); a }
    assert(java.util.Arrays.equals(QuantileSketch.toBytes(sNew), sRef.bytes))
    // round-trip through the wire format and keep merging — still identical
    val halves = buildNew.grouped(3).map(_.reduce { (a, b) => a.merge(b); a }).toArray
    val rt = halves.map(h => QuantileSketch.fromBytes(QuantileSketch.toBytes(h)))
    val sRt = rt.reduce { (a, b) => a.merge(b); a }
    val extra = Array.fill(500)(rnd.nextDouble())
    extra.foreach(sRt.add)
    val sRef2 = buildRef.grouped(3).map(_.reduce { (a, b) => a.merge(b); a })
      .toArray.reduce { (a, b) => a.merge(b); a }
    extra.foreach(sRef2.add)
    assert(java.util.Arrays.equals(QuantileSketch.toBytes(sRt), sRef2.bytes))
  }

  test("QSketch survives Spark's Kryo serializer (buffer shuffle/spill round trip)") {
    val kryo = new KryoSerializer(new SparkConf(false)).newInstance()
    val rnd = new Random(99)
    val s = new QSketch(16)
    Array.fill(3000)(rnd.nextDouble() * 10.0).foreach(s.add)
    val back = kryo.deserialize[QSketch](kryo.serialize(s))
    assert(back.k == s.k && back.n == s.n && back.err == s.err)
    // the Kryo path rides the QSK1 wire format, whose round trip drops
    // empty-level bookkeeping exactly like fromBytes always has — so
    // the reference is the wire-round-tripped sketch, not the original
    val ref = QuantileSketch.fromBytes(QuantileSketch.toBytes(s))
    assert(java.util.Arrays.equals(QuantileSketch.toBytes(back), QuantileSketch.toBytes(ref)))
    // a deserialized buffer must keep ingesting identically
    val extra = Array.fill(200)(rnd.nextDouble())
    extra.foreach(back.add)
    extra.foreach(ref.add)
    assert(back.n == ref.n && back.err == ref.err)
    assert(java.util.Arrays.equals(QuantileSketch.toBytes(back), QuantileSketch.toBytes(ref)))
    assert(back.quantile(0.5) == ref.quantile(0.5))
  }

  // ---- fused sum + top-k rank (Similarity.sumRankTopKMicro) ----

  /** The r15 shape, re-derived: groupBy(query, doc).sum + the bounded
    * heap rankTopK with its (score desc, doc asc) tie contract.
    */
  private def oldSumRank(contribs: org.apache.spark.sql.DataFrame, k: Int) = {
    val scores = contribs.groupBy("query_id", "doc_id")
      .agg(sum("c_micro").as("score_micro"))
    val w = Window.partitionBy($"query_id").orderBy($"score_micro".desc, $"doc_id")
    scores.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"doc_id", $"rank".cast("long").as("rank"),
        $"score_micro".cast("long").as("score_micro"))
  }

  test("sumRankTopKMicro == groupBy-sum + rank, including score ties") {
    val rnd = new Random(31)
    // heavy duplication + deliberate ties: scores drawn from a tiny set
    val rows = (1 to 4000).map { _ =>
      (rnd.nextInt(7).toLong, rnd.nextInt(120).toLong, (rnd.nextInt(4) * 500L))
    }
    val contribs = rows.toDF("query_id", "doc_id", "c_micro")
    for (k <- Seq(1, 5, 10)) {
      val got = Similarity.sumRankTopKMicro(contribs, k)
        .orderBy("query_id", "rank").collect().toSeq
      val want = oldSumRank(contribs, k)
        .orderBy("query_id", "rank").collect().toSeq
      assert(got == want, s"k=$k fused ranking diverged")
    }
  }

  test("sumRankTopKFusion == rrf groupBy + rank + join-back") {
    val rnd = new Random(77)
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(60).toLong, 1000000L / (60L + rnd.nextInt(10)))
    }
    val contribs = rows.toDF("query_id", "doc_id", "c_micro")
    val fusedOld = {
      val f = contribs.groupBy("query_id", "doc_id")
        .agg(count(lit(1)).as("n_lists"), sum("c_micro").as("rrf_micro"))
      val w = Window.partitionBy($"query_id").orderBy($"rrf_micro".desc, $"doc_id")
      f.withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
        .select($"query_id", $"doc_id", $"rank".cast("long").as("rank"),
          $"n_lists", $"rrf_micro")
    }
    val got = Similarity.sumRankTopKFusion(contribs, 10)
      .orderBy("query_id", "rank").collect().toSeq
    val want = fusedOld.orderBy("query_id", "rank").collect().toSeq
    assert(got == want)
  }

  // ---- Lloyd-round fixed-point collect: driver-combine vs shuffle ----

  test("centroidRows driver-combine path == shuffle path (kmeans and PQ bit-identity)") {
    val rnd = new Random(5)
    val embs = (0L until 400L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    def run(): (Array[Array[Double]], graft.ops.ProductQuantization.Codebooks) = {
      val (_, centers) = graft.ops.Clustering.kmeans(embs, k = 8, iters = 3)
      val books = graft.ops.ProductQuantization.trainCodebooks(embs, m = 4, codes = 8, iters = 3)
      (centers, books)
    }
    val (cFast, bFast) = run() // tiny key space: driver-combine path
    val old = graft.ops.Clustering.DriverCombineMaxBytes
    graft.ops.Clustering.DriverCombineMaxBytes = 0L // force the shuffle path
    try {
      val (cShuf, bShuf) = run()
      assert(cFast.length == cShuf.length)
      cFast.zip(cShuf).foreach { case (a, b) => assert(a.sameElements(b)) }
      bFast.zip(bShuf).foreach { case (sa, sb) =>
        sa.zip(sb).foreach { case (a, b) => assert(a.sameElements(b)) }
      }
    } finally graft.ops.Clustering.DriverCombineMaxBytes = old
  }

  // ---- Spread guard cap ----

  test("Spread.ifNarrow leaves a large-estimate frame untouched (capped guard)") {
    // size estimate for range(n) is 8 bytes/row: 400M rows ~ 3.2 GB,
    // over the 1 GB cap on ANY parallelism — must pass through
    // untouched (eq, not just equal plans), with no job run
    val big = spark.range(400000000L).toDF("id")
    assert(graft.core.Spread.ifNarrow(big) eq big)
    val tiny = spark.range(10L).toDF("id")
    assert(!(graft.core.Spread.ifNarrow(tiny) eq tiny))
  }
}
