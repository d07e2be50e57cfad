package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the deep ANN serving anchor: decomposes the
  * IVF-PQ build at a given corpus size into its stages (k-means,
  * assignment+write, PQ codebook training, PQ encode+write, probe) so
  * the build cost can be attributed instead of guessed at. Not part of
  * the driver contract.
  */
object AnnBuildProbe {
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
    val kCells = 128
    val m = 8
    val codes = 16

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val comps = (0 until dim).map(dd =>
      ((pmod(hash($"id", lit(dd)), lit(2000)) - lit(1000)).cast("double") / 1000.0)
        .cast("float"))
    // materialized, like a real (parquet) corpus — the raw generated
    // frame fused into the kernels drops out of codegen (see
    // AnnStageProbe's control and BENCH_NOTES §13)
    val vecs = spark.range(n)
      .select($"id".as("vec_id"), array(comps: _*).as("embedding"))
      .localCheckpoint()
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_annprobe_$n"

    println(s"== n = $n, dim = $dim, k = $kCells, m = $m, codes = $codes ==")
    time("kmeans (1 iter)") {
      graft.ops.Clustering.kmeans(vecs, kCells, iters = 1)._1.count()
    }
    time("AnnIndex.build (kmeans+write)") {
      graft.ops.AnnIndex.build(vecs, dir, nClusters = kCells, iters = 1, nTotal = n)
    }
    val stored = spark.read.parquet(graft.ops.AnnIndex.vectorsPath(dir))
      .select($"vec_id", $"v".as("embedding"))
    time("trainCodebooks (1 iter)") {
      graft.ops.ProductQuantization.trainCodebooks(stored, m, codes, iters = 1)
    }
    time("buildPq (train+encode+write)") {
      graft.ops.AnnIndex.buildPq(spark, dir, m = m, codes = codes, iters = 1)
    }
    val q = vecs.filter($"vec_id" < 50)
    time("topKPq probe (cold)") {
      graft.ops.AnnIndex.topKPq(spark, dir, q, k = 10, nProbe = 8)
        .write.mode("overwrite").format("noop").save()
    }
    time("topKPq probe (warm)") {
      graft.ops.AnnIndex.topKPq(spark, dir, q, k = 10, nProbe = 8)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
