package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Persistence for trained pipeline artifacts — BPE vocabularies,
  * classifier weights, PQ codebooks — as plain parquet tables, so a
  * model trains once (batch) and applies anywhere (other jobs,
  * streaming `foreachBatch`, other engines: the layouts are
  * self-describing rows, not serialized JVM objects).
  *
  * Layouts:
  *   - BPE:        (rank, left, right) — the ordered merge list; the
  *                 vocabulary is derived on load (same derivation as
  *                 training, so save/load is exact);
  *   - classifier: (class_idx, label) label table + (class_idx, bucket,
  *                 weight) SPARSE weight rows (zero weights — the vast
  *                 majority of a hashed-feature matrix — are omitted);
  *   - PQ:         (sub, code, dim, weight) codeword components.
  *
  * Writes are `overwrite` into a fresh directory; at scale wrap with
  * [[graft.sources.BucketedLayout.compact]]-style swaps if a model
  * path is read concurrently with retraining.
  */
object ModelIO {

  // ------------------------------------------------------------------ BPE

  def saveBpe(spark: SparkSession, model: Bpe.Model, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadBpe(spark: SparkSession, path: String): Bpe.Model = {
    import spark.implicits._
    val merges = spark.read.parquet(path)
      .select($"rank".cast("int"), $"left", $"right")
      .as[(Int, String, String)]
      .collect().sortBy(_._1)
      .map { case (_, l, r) => (l, r) }
      .toVector
    // Rebuild the vocab exactly as training derives it: base symbols
    // are every single symbol referenced by the merges (plus merge
    // results appended in rank order). Sufficient for encode/decode —
    // encodeWord only consults ranks.
    val base = merges.iterator.flatMap { case (a, b) => Iterator(a, b) }
      .filter(s => s.length <= 1 + Bpe.EndOfWord.length).toSet.toVector.sorted
    Bpe.Model(merges, base ++ merges.map { case (a, b) => a + b })
  }

  // ----------------------------------------------------------- classifier

  def saveClassifier(spark: SparkSession, model: TextClassifier.Model, basePath: String): Unit = {
    import spark.implicits._
    model.labels.zipWithIndex.map { case (l, i) => (i, l) }
      .toDF("class_idx", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$basePath/labels")
    val rows = for {
      ci <- model.w.indices.iterator
      b <- model.w(ci).indices.iterator
      v = model.w(ci)(b)
      if v != 0.0f
    } yield (ci, b, v)
    spark.createDataset(rows.toSeq).toDF("class_idx", "bucket", "weight")
      .write.mode(SaveMode.Overwrite).parquet(s"$basePath/weights")
    spark.createDataset(Seq(model.nBuckets)).toDF("n_buckets")
      .write.mode(SaveMode.Overwrite).parquet(s"$basePath/meta")
  }

  def loadClassifier(spark: SparkSession, basePath: String): TextClassifier.Model = {
    import spark.implicits._
    val labels = spark.read.parquet(s"$basePath/labels")
      .select($"class_idx".cast("int"), $"label")
      .as[(Int, String)].collect().sortBy(_._1).map(_._2).toVector
    val nBuckets = spark.read.parquet(s"$basePath/meta")
      .select($"n_buckets".cast("int")).as[Int].head()
    val w = Array.fill(labels.length)(new Array[Float](nBuckets))
    spark.read.parquet(s"$basePath/weights")
      .select($"class_idx".cast("int"), $"bucket".cast("int"), $"weight".cast("float"))
      .as[(Int, Int, Float)]
      .collect()
      .foreach { case (ci, b, v) => w(ci)(b) = v }
    TextClassifier.Model(labels, nBuckets, w)
  }

  // ------------------------------------------------------------------ PCA

  def savePca(spark: SparkSession, model: Pca.Model, path: String): Unit = {
    import spark.implicits._
    val meanRows = model.mean.iterator.zipWithIndex.map { case (v, d) => (-1, d, v) }
    val compRows = for {
      c <- model.components.indices.iterator
      d <- model.components(c).indices.iterator
    } yield (c, d, model.components(c)(d))
    // component -1 = the mean vector; dim -1 = the eigenvalue row.
    val evRows = model.eigenvalues.iterator.zipWithIndex.map { case (v, c) => (c, -1, v) }
    spark.createDataset((meanRows ++ compRows ++ evRows).toSeq)
      .toDF("component", "dim", "weight")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadPca(spark: SparkSession, path: String): Pca.Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select($"component".cast("int"), $"dim".cast("int"), $"weight".cast("double"))
      .as[(Int, Int, Double)].collect()
    val mean = rows.filter(_._1 == -1).sortBy(_._2).map(_._3)
    val ev = rows.filter(r => r._1 >= 0 && r._2 == -1).sortBy(_._1).map(_._3)
    val comps = rows.filter(r => r._1 >= 0 && r._2 >= 0).groupBy(_._1).toArray
      .sortBy(_._1).map { case (_, rs) => rs.sortBy(_._2).map(_._3) }
    Pca.Model(mean, comps, ev)
  }

  // ------------------------------------------------------------------- PQ

  def savePqCodebooks(spark: SparkSession, books: ProductQuantization.Codebooks, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      s <- books.indices.iterator
      c <- books(s).indices.iterator
      d <- books(s)(c).indices.iterator
    } yield (s, c, d, books(s)(c)(d))
    spark.createDataset(rows.toSeq).toDF("sub", "code", "dim", "weight")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadPqCodebooks(spark: SparkSession, path: String): ProductQuantization.Codebooks = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select($"sub".cast("int"), $"code".cast("int"), $"dim".cast("int"),
        $"weight".cast("double"))
      .as[(Int, Int, Int, Double)]
      .collect()
    val m = rows.iterator.map(_._1).max + 1
    val books = Array.tabulate(m) { s =>
      val subRows = rows.filter(_._1 == s)
      val nCodes = subRows.iterator.map(_._2).max + 1
      Array.tabulate(nCodes) { c =>
        val cw = subRows.filter(_._2 == c).sortBy(_._3)
        cw.map(_._4)
      }
    }
    books
  }
}
