package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query latencies plus the
  * engine's two headline metrics — ingest→summarize throughput and the
  * summary compression ratio (the reference's N → O(log N) effect,
  * `/root/reference/core/db_test.go:330-334`). Failures are reported as
  * explicit error entries, never as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = collection.mutable.LinkedHashMap.empty[String, String]

    // Pipeline materialization: events -> summary/landmark tables. A
    // failure here must still produce the JSON line (with an error
    // entry), never a bare crash the driver can't parse.
    val tIngest0 = System.nanoTime()
    val (rawRows, windowRows) =
      try SparkEntry.materialize(spark, sfDir)
      catch {
        case e: Throwable =>
          errors("__materialize") = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          (0L, 0L)
      }
    val ingestSec = (System.nanoTime() - tIngest0) / 1e9
    val rowsPerSec = if (ingestSec > 0) rawRows / ingestSec else 0.0
    val compression = if (windowRows > 0) rawRows.toDouble / windowRows else 0.0
    // Stable timing protocol: deterministic (sorted) query order, one
    // untimed warm-up execution (first-touch parquet footers, codegen
    // compilation, persisted-table materialization), then the median of
    // 3 timed runs. Map-iteration-order single-run timings made r3's
    // numbers unattributable (first query to touch a cold table paid
    // the whole materialization).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm-up, untimed
        val runs = Array.fill(3) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = runs.sorted.apply(1) // median of 3
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }

    // Big-stream anchor: one synthetic 1M-element stream summarizes at
    // full pipeline throughput (no per-stream overhead), shows the
    // N -> O(log N) compression the engine exists for.
    val (bigRowsPerSec, bigWindows) = {
      import spark.implicits._
      import org.apache.spark.sql.functions.lit
      val n = 1000000L
      val events = spark.range(n)
        .select($"id".as("seq"), $"id".as("ts"), ($"id" % 97).cast("double").as("value"))
        .withColumn("streamId", lit(999L))
        .as[graft.core.Event]
      def run(): (Double, Long) = {
        val t0 = System.nanoTime()
        val w = graft.core.Summarizer
          .summarize(events, graft.windowing.ExponentialWindowing(2.0)).count()
        ((System.nanoTime() - t0) / 1e9, w)
      }
      run() // warm-up, untimed
      val runs = Array.fill(3)(run())
      val sec = runs.map(_._1).sorted.apply(1)
      (n / sec, runs.head._2)
    }

    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = timings.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val total = ingestSec + timings.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$es,"ingest_sec":$ingestSec,"ingest_rows_per_sec":$rowsPerSec,""" +
      s""""raw_rows":$rawRows,"summary_windows":$windowRows,"compression_ratio":$compression,""" +
      s""""big_stream_rows_per_sec":$bigRowsPerSec,"big_stream_windows":$bigWindows,""" +
      s""""sf":${jq(sfDir)}}""")
    spark.stop()
  }
}
