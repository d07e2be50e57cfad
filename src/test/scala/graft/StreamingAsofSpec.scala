package graft

import graft.ops.AsofJoin
import graft.streaming.StreamingAsof
import graft.streaming.StreamingAsof.{mark, probe, AsofInput, Enriched}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic synthetic ticks + probes over a few keys, with
  // coincident timestamps and probes preceding every mark.
  private def rows: Seq[AsofInput] = {
    val marks = for {
      k <- 0L until 3L
      i <- 0L until 20L
    } yield mark(k, ts = 10 * i + k, value = (k * 100 + i).toDouble)
    val probes = for {
      k <- 0L until 3L
      j <- 0L until 30L
    } yield probe(k, ts = 7 * j, probeId = k * 1000 + j)
    (marks ++ probes).sortBy(_.ts)
  }

  private def runStreaming(batches: Seq[Seq[AsofInput]], name: String): Seq[Enriched] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[AsofInput]
    val q = StreamingAsof.enrich(source.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Enriched].collect().toSeq.sortBy(_.probeId)
  }

  private def batchExpected: Seq[Enriched] = {
    val left = rows.filterNot(_.isMark)
      .map(r => (r.key, r.ts, r.probeId)).toDF("key", "ts", "probeId")
    val right = rows.filter(_.isMark)
      .map(r => (r.key, r.ts, r.value)).toDF("key", "ts", "value")
    AsofJoin.asofJoin(left, right, "key", "ts", Seq("value"))
      .collect().toSeq
      .map(r => Enriched(r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(_.probeId)
  }

  test("single batch reproduces the batch as-of join exactly") {
    assert(runStreaming(Seq(rows), "asof_one") == batchExpected)
  }

  test("any ts-ordered batch split reproduces the batch as-of join") {
    val ordered = rows.sortBy(r => (r.ts, if (r.isMark) 0 else 1))
    val splits = Seq(
      ordered.grouped(7).toSeq,
      ordered.grouped(1).toSeq.take(40) :+ ordered.drop(40), // many tiny batches then the rest
      Seq(ordered.take(50), ordered.slice(50, 51), ordered.drop(51)))
    splits.zipWithIndex.foreach { case (batches, i) =>
      assert(runStreaming(batches, s"asof_split_$i") == batchExpected,
        s"split $i diverged from batch")
    }
  }

  test("probes before every mark get None; coincident mark is visible") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[AsofInput]
    val q = StreamingAsof.enrich(source.toDS())
      .writeStream.format("memory").queryName("asof_edge")
      .outputMode(OutputMode.Append())
      .start()
    source.addData(Seq(probe(1L, 5L, 1L), mark(1L, 10L, 42.0), probe(1L, 10L, 2L)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("asof_edge").as[Enriched].collect().sortBy(_.probeId)
    assert(out(0).asofTs.isEmpty && out(0).asofValue.isEmpty)
    assert(out(1).asofTs.contains(10L) && out(1).asofValue.contains(42.0))
  }

  test("maxHistory keeps the newest marks; probes within retained depth stay exact") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[AsofInput]
    val q = StreamingAsof.enrich(source.toDS(), maxHistory = 2)
      .writeStream.format("memory").queryName("asof_hist")
      .outputMode(OutputMode.Append())
      .start()
    source.addData(Seq(mark(1L, 10L, 1.0), mark(1L, 20L, 2.0), mark(1L, 30L, 3.0)))
    q.processAllAvailable()
    // ts=35 -> latest retained mark is 30; ts=25 still answerable from
    // the kept {20, 30} history.
    source.addData(Seq(probe(1L, 35L, 1L), probe(1L, 25L, 2L)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("asof_hist").as[Enriched].collect().sortBy(_.probeId)
    assert(out(0).asofTs.contains(30L) && out(0).asofValue.contains(3.0))
    assert(out(1).asofTs.contains(20L) && out(1).asofValue.contains(2.0))
  }
}
