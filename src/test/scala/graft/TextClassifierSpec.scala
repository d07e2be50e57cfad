package graft

import graft.ops.TextClassifier
import org.apache.spark.sql.functions._

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Corpus with planted class markers: label = doc_id % 3, each class
    * appends its own marker tokens (the corpus text itself carries no
    * label signal — it is shared-vocabulary word salad).
    */
  private def planted = docs.select($"doc_id", $"text")
    .withColumn("label", concat(lit("class"), $"doc_id" % 3))
    .withColumn("text", concat($"text",
      when($"doc_id" % 3 === 0, lit(" qqzero qqnull qqzero qqnull qqzero qqnull"))
        .when($"doc_id" % 3 === 1, lit(" qqone qqunit qqone qqunit qqone qqunit"))
        .otherwise(lit(" qqtwo qqpair qqtwo qqpair qqtwo qqpair"))))

  test("learns planted markers: perfect held-out accuracy") {
    val train = planted.filter($"doc_id" % 4 =!= 3)
    val test = planted.filter($"doc_id" % 4 === 3)
    val m = TextClassifier.train(train, "label")
    val pred = TextClassifier.predict(test, m)
      .join(test.select($"doc_id", $"label"), "doc_id")
    val wrong = pred.filter($"predicted" =!= $"label").count()
    assert(wrong == 0L, s"$wrong of ${test.count()} held-out docs misclassified")
  }

  test("beats nothing without signal (sanity: not a constant classifier)") {
    val m = TextClassifier.train(planted, "label")
    val preds = TextClassifier.predict(planted, m)
      .select($"predicted").distinct().count()
    assert(preds == 3L, "all three classes must be predicted somewhere")
  }

  test("training is deterministic under repartition") {
    val a = TextClassifier.train(planted, "label", iters = 5)
    val b = TextClassifier.train(planted.repartition(7), "label", iters = 5)
    assert(a.labels == b.labels)
    a.w.zip(b.w).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("features: L1-normalized, hashed, empty-safe") {
    val fs = TextClassifier.features("a b a", 1 << 16)
    assert(math.abs(fs.map(_._2).sum - 1.0) < 1e-12)
    assert(fs.length == 2) // 'a' bucket carries 2/3
    assert(TextClassifier.features("", 16).isEmpty)
    assert(TextClassifier.features("   ", 16).isEmpty)
  }

  test("predict on empty text yields the first label, no crash") {
    val m = TextClassifier.train(planted, "label", iters = 1)
    val out = TextClassifier.predict(Seq((99L, "")).toDF("doc_id", "text"), m)
      .select($"predicted").as[String].head()
    assert(out == m.labels.head)
  }
}
