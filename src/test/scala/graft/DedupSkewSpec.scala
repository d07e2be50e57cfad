package graft

import graft.ops.{Dedup, LineDedup, MediaDedup, SubstringDedup, UrlCuration}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The r10 skew contract for the keep-one / duplicate-flag family: a
  * pathologically hot key (the mega-duplicated page / boilerplate line
  * / viral image dedup exists to find) must never serialize onto a
  * single un-splittable WindowExec task. Each operator's physical plan
  * is asserted Window-free — counts/keepers come from
  * map-side-combinable hash aggregation (hot keys collapse to one row
  * per map task before any exchange) and, where the output is
  * per-occurrence, an AQE-skew-splittable shuffle join back. Results on
  * the skewed corpus are checked against the obvious closed form, and
  * expensive derived frames (media decode) are proven to evaluate
  * exactly once via an accumulator.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private val HotCopies = 200000
  private val Distinct = 5000

  /** Physical plan of `df` contains no window operator. */
  private def assertWindowFree(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"$what plan contains a WindowExec:\n$plan")
  }

  private def skewedDocs: DataFrame =
    spark.range(HotCopies + Distinct).select(
      $"id".as("doc_id"),
      when($"id" < HotCopies, lit("the same viral page body"))
        .otherwise(concat(lit("unique document "), $"id")).as("text"))

  test("dropExactDuplicates: hot key via map-side-combined min_by, no window") {
    val out = Dedup.dropExactDuplicates(skewedDocs)
    assertWindowFree(out, "dropExactDuplicates")
    val rows = out.collect()
    assert(rows.length == Distinct + 1)
    // keep-one keeps the minimum id of the hot class
    assert(rows.map(_.getAs[Long]("doc_id")).min == 0L)
    assert(rows.count(_.getAs[String]("text") == "the same viral page body") == 1)
    // schema round-trips column names and order
    assert(out.columns.toSeq == Seq("doc_id", "text"))
  }

  test("dedupByUrl: hot canonical URL via min_by, no window") {
    val df = spark.range(HotCopies + Distinct).select(
      $"id".as("doc_id"),
      when($"id" < HotCopies, lit("https://hot.example.com/page?utm_source=x"))
        .otherwise(concat(lit("https://ok.example.org/p/"), $"id")).as("url"))
    val out = UrlCuration.dedupByUrl(df)
    assertWindowFree(out, "dedupByUrl")
    assert(out.count() == Distinct + 1)
    assert(out.where($"url".contains("hot.example.com")).select(min($"doc_id")).as[Long].head() == 0L)
  }

  test("duplicatedLinesFrom: one boilerplate line in every doc, no window on the line key") {
    // every doc carries the same footer line; unique body lines otherwise
    val docs = spark.range(20000).select(
      $"id".as("doc_id"),
      concat(lit("body line "), $"id", lit("\nshared cookie banner")).as("text"))
    val l = LineDedup.lines(docs).localCheckpoint() // caller-persist discipline
    val out = LineDedup.duplicatedLinesFrom(l)
    assertWindowFree(out, "duplicatedLinesFrom")
    val flagged = out.collect()
    assert(flagged.length == 20000) // only the banner occurrences are duplicated
    assert(flagged.forall(_.getAs[Long]("cnt") == 20000L))
    assert(flagged.count(_.getAs[Boolean]("kept")) == 1)
    assert(flagged.find(_.getAs[Boolean]("kept")).get.getAs[Long]("doc_id") == 0L)
  }

  test("rankedDuplicatedWindows: hot window key, no window operator in plan") {
    val docs = spark.range(3000).select(
      $"id".as("doc_id"),
      when($"id" < 2000, lit("alpha beta gamma delta epsilon zeta"))
        .otherwise(concat(
          lit("ua"), $"id", lit(" ub"), $"id", lit(" uc"), $"id",
          lit(" ud"), $"id", lit(" ue"), $"id")).as("text"))
    val out = SubstringDedup.rankedDuplicatedWindows(docs, minTokens = 4)
    assertWindowFree(out, "rankedDuplicatedWindows")
    val rows = out.collect()
    // 2000 hot docs x 3 windows each (6 tokens, L=4 -> starts 0,1,2)
    assert(rows.length == 2000 * 3)
    assert(rows.count(_.getAs[Boolean]("kept")) == 3) // one keeper per window offset key
    assert(rows.filter(_.getAs[Boolean]("kept")).forall(_.getAs[Long]("doc_id") == 0L))
  }

  test("exactContentDuplicatePairs: hot image class, no window, decode runs once") {
    val n = 4000
    val acc: LongAccumulator = spark.sparkContext.longAccumulator("payloadGen")
    // distinct 1x1 PNGs by color; doc_id % 4 == 0 all share one color
    val mk = udf { (id: Long) =>
      acc.add(1L)
      val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = if (id % 4 == 0) 0x123456 else (id.toInt * 2654435761L.toInt) & 0xFFFFFF
      (0 until 2).foreach(x => (0 until 2).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.range(n).select(
      $"id".as("doc_id"), lit("image").as("media_type"), mk($"id").as("payload"))
    val out = MediaDedup.exactContentDuplicatePairs(media)
    assertWindowFree(out, "exactContentDuplicatePairs")
    val pairs = out.collect()
    val hot = pairs.filter(_.getAs[Long]("a") == 0L)
    assert(hot.length == n / 4 - 1) // k-copy class -> k-1 pairs, a = min id
    // the eagerly localCheckpoint'ed signature frame decoded the corpus ONCE:
    // both join branches read the persisted blocks, so payload generation
    // (upstream of the decode UDF) ran exactly n times, not 2n.
    assert(acc.value == n.toLong,
      s"payload generation ran ${acc.value} times for $n rows — derived frame evaluated more than once")
  }
}
