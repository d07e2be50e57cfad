package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-stage bisection of [[graft.ops.AnnIndex.build]]'s assign+write
  * path (AnnBuildProbe attributed ~98% of the deep build there):
  * assignment alone, +repartition, +partitioned write, and the
  * no-partitionBy / no-salt controls. Reuses the centers a previous
  * AnnBuildProbe run left at the probe dir. Not part of the driver
  * contract.
  */
object AnnStageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val dim = 64
    val comps = (0 until dim).map(dd =>
      ((pmod(hash($"id", lit(dd)), lit(2000)) - lit(1000)).cast("double") / 1000.0)
        .cast("float"))
    val vecs = spark.range(n)
      .select($"id".as("vec_id"), array(comps: _*).as("embedding"))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_annprobe_$n"
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_annstage_$n"

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // CONTROL: kernel fused with the raw 64-expression generator —
    // the whole stage drops out of codegen and runs ~70x slower (the
    // r11 cliff; measured 430 s at 500k vs seconds materialized).
    // Gated behind arg(1)="control" so the default probe stays fast.
    if (args.length > 1 && args(1) == "control") {
      val assignedRaw = graft.ops.AnnIndex.assignCells(spark, dir, vecs)
      time("assign over RAW generator (codegen-fallback control)") { force(assignedRaw) }
    }
    val mat = vecs.localCheckpoint()
    time("materialize generator (localCheckpoint)") { mat.count() }
    val assigned = graft.ops.AnnIndex.assignCells(spark, dir, mat)
    time("assign over materialized (noop)") { force(assigned) }
    time("assign again (warm)") { force(assigned) }
    val salted = assigned.repartition(col("cell"), pmod(hash(col("vec_id")), lit(8)))
    time("assign + repartition(cell,salt) (noop)") { force(salted) }
    time("  + plain parquet write (no partitionBy)") {
      salted.write.mode("overwrite").parquet(s"$out/plain")
    }
    time("  + partitionBy(cell) write") {
      salted.write.mode("overwrite").partitionBy("cell").parquet(s"$out/part")
    }
    spark.stop()
  }
}
