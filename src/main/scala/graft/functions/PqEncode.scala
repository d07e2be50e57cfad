package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: product-quantization encoding of a
  * float-array vector — the `m` nearest-codeword indices over the
  * unit-normalized vector's subspaces.
  *
  * The PQ encode is the corpus-sized compression pass (every vector,
  * once, O(m * codes * subdim) each); as a Scala UDF it paid a boxed
  * Seq[Float] conversion plus a heap-allocated unit-normalized copy
  * per row. This expression reads UnsafeArrayData directly and
  * normalizes on the fly (`x / norm` inside the distance loop — the
  * same double ops [[graft.ops.Similarity.unit]] performs, so codes
  * are bit-identical). Codebooks travel as a [[RefTable]]
  * (inline below the byte cap, broadcast above), like
  * [[NearestCentroid]]'s centers.
  *
  * Matches [[graft.ops.ProductQuantization]]'s original kernel
  * exactly: subspace s owns dims [s*ceil(d/m), min(..+w, d)), squared
  * L2 over the common prefix, strict `<` so the first best code wins,
  * zero-norm vectors quantize as all-zero vectors.
  */
case class PqEncode(child: Expression, booksRef: RefTable[Array[Array[Array[Double]]]])
    extends UnaryExpression {

  @transient private lazy val books: Array[Array[Array[Double]]] = booksRef.value

  require(booksRef.value.nonEmpty, "PqEncode needs at least one sub-codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = v.numElements()
    val m = books.length
    var nn = 0.0
    var i = 0
    while (i < d) { val x = v.getFloat(i).toDouble; nn += x * x; i += 1 }
    val norm = math.sqrt(nn)
    val w = (d + m - 1) / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val lo = s * w
      val hi = math.min(lo + w, d)
      val cb = books(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        val n = math.min(cw.length, math.max(hi - lo, 0))
        var dist = 0.0
        var j = 0
        while (j < n) {
          val x = v.getFloat(lo + j).toDouble
          val u = if (norm == 0.0) x else x / norm
          val t = cw(j) - u
          dist += t * t
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj(
      "booksRef", booksRef, classOf[RefTable[_]].getName)
    val bRef = ctx.addMutableState("double[][][]", "booksTable",
      v => s"$v = (double[][][]) $refName.value();")
    nullSafeCodeGen(ctx, ev, v => {
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val nn = ctx.freshName("nn")
      val norm = ctx.freshName("norm")
      val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val cb = ctx.freshName("cb")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cw = ctx.freshName("cw")
      val n = ctx.freshName("n")
      val dist = ctx.freshName("dist")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      s"""
         |int $d = $v.numElements();
         |int $m = $bRef.length;
         |double $nn = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  double xv = (double) $v.getFloat($i); $nn += xv * xv;
         |}
         |double $norm = java.lang.Math.sqrt($nn);
         |int $w = ($d + $m - 1) / $m;
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $lo = $s * $w;
         |  int $hi = java.lang.Math.min($lo + $w, $d);
         |  double[][] $cb = $bRef[$s];
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $cw = $cb[$c];
         |    int $n = java.lang.Math.min($cw.length, java.lang.Math.max($hi - $lo, 0));
         |    double $dist = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double xv = (double) $v.getFloat($lo + $j);
         |      double uv = ($norm == 0.0) ? xv : xv / $norm;
         |      double tv = $cw[$j] - uv;
         |      $dist += tv * tv;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Inline-table convenience for small codebooks. */
  def apply(child: Expression, books: Array[Array[Array[Double]]]): PqEncode =
    PqEncode(child, InlineRef(books))
}
