package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: the indices of the `n` nearest centers
  * (by cosine) for a float-array vector — the IVF probe kernel
  * ([[graft.ops.Clustering.ivfTopK]], [[graft.ops.AnnIndex.topK]]).
  *
  * Scoring matches the Scala probe it replaces bit for bit:
  * `Similarity.cosine` semantics (dot and BOTH norms over the common
  * prefix, zero-norm → 0) against float-converted centers, selection
  * ordered by (score desc, center index asc). A query batch can be
  * millions of rows; the per-row boxed Seq[Float] conversion plus a
  * k-tuple sort per row is what this removes.
  */
case class TopCentroids(
    child: Expression, centersRef: RefTable[Array[Array[Float]]], n: Int)
    extends UnaryExpression {

  @transient private lazy val centers: Array[Array[Float]] = centersRef.value

  require(centersRef.value.nonEmpty && n >= 1,
    s"need centers and n >= 1: ${centersRef.value.length}, $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_centroids"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val len = v.numElements()
    val cap = math.min(n, centers.length)
    val bi = new Array[Int](cap)
    val bs = new Array[Double](cap)
    var filled = 0
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val m = math.min(ctr.length, len)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val xv = ctr(i).toDouble
        val yv = v.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      // Insert keeping (score desc, index asc): strict > only, so an
      // equal-score earlier index stays ahead (c is ascending).
      var pos = filled
      while (pos > 0 && s > bs(pos - 1)) pos -= 1
      if (pos < cap) {
        val last = math.min(filled, cap - 1)
        var j = last
        while (j > pos) { bs(j) = bs(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bs(pos) = s; bi(pos) = c
        if (filled < cap) filled += 1
      }
      c += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj(
      "centersRef", centersRef, classOf[RefTable[_]].getName)
    val cRef = ctx.addMutableState("float[][]", "centersTable",
      v => s"$v = (float[][]) $refName.value();")
    nullSafeCodeGen(ctx, ev, v => {
      val len = ctx.freshName("len")
      val cap = ctx.freshName("cap")
      val bi = ctx.freshName("bi")
      val bs = ctx.freshName("bs")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val pos = ctx.freshName("pos")
      val last = ctx.freshName("last")
      val j = ctx.freshName("j")
      s"""
         |int $len = $v.numElements();
         |int $cap = java.lang.Math.min($n, $cRef.length);
         |int[] $bi = new int[$cap];
         |double[] $bs = new double[$cap];
         |int $filled = 0;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  float[] $ctr = $cRef[$c];
         |  int $m = java.lang.Math.min($ctr.length, $len);
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double xv = (double) $ctr[$i];
         |    double yv = (double) $v.getFloat($i);
         |    $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |  }
         |  double $s = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  int $pos = $filled;
         |  while ($pos > 0 && $s > $bs[$pos - 1]) $pos--;
         |  if ($pos < $cap) {
         |    int $last = java.lang.Math.min($filled, $cap - 1);
         |    for (int $j = $last; $j > $pos; $j--) { $bs[$j] = $bs[$j - 1]; $bi[$j] = $bi[$j - 1]; }
         |    $bs[$pos] = $s; $bi[$pos] = $c;
         |    if ($filled < $cap) $filled++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

object TopCentroids {
  /** Inline-table convenience for small center sets. */
  def apply(child: Expression, centers: Array[Array[Float]], n: Int): TopCentroids =
    TopCentroids(child, InlineRef(centers), n)
}
