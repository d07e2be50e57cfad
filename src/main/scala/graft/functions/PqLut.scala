package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native Catalyst expression: the per-query PQ-ADC lookup table —
  * `LUT[sub][code] = <q_sub, codeword>` over the UNIT-NORMALIZED query
  * vector, flattened row-major to `array<float>` of length
  * `m * codes` (`LUT[sub * codes + code]`).
  *
  * This moves the LUT build OFF the driver: the previous shape
  * collected the whole query batch and computed an m x codes table per
  * query in a driver loop, then shipped the map to executors — bounded
  * by convention only (a million-query batch is Q * m * codes * 4
  * bytes of driver memory and serial work). As a projection over the
  * query frame the build is distributed, codegen'd, and the codebooks
  * (the only broadcast-able constant left) are m * codes * subDim
  * doubles — tiny.
  *
  * Math is bit-identical to the driver loop it replaces: normalize in
  * double ([[graft.ops.Similarity.unit]] semantics — the same on-the-
  * fly `x / norm` as [[PqEncode]]), per-sub dot in double over the
  * common prefix of codeword and subvector, cast to float per entry.
  * Subspace s owns dims [s*ceil(d/m), min(..+w, d)); every sub-
  * codebook has the same `codes` entries by construction
  * ([[graft.ops.ProductQuantization.trainCodebooks]]).
  */
case class PqLut(child: Expression, booksRef: RefTable[Array[Array[Array[Double]]]])
    extends UnaryExpression {

  @transient private lazy val books: Array[Array[Array[Double]]] = booksRef.value

  require(booksRef.value.nonEmpty, "PqLut needs at least one sub-codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = v.numElements()
    val m = books.length
    val codes = books(0).length
    var nn = 0.0
    var i = 0
    while (i < d) { val x = v.getFloat(i).toDouble; nn += x * x; i += 1 }
    val norm = math.sqrt(nn)
    val w = (d + m - 1) / m
    val out = new Array[Float](m * codes)
    var s = 0
    while (s < m) {
      val lo = s * w
      val hi = math.min(lo + w, d)
      val cb = books(s)
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        val n = math.min(cw.length, math.max(hi - lo, 0))
        var dot = 0.0
        var j = 0
        while (j < n) {
          val x = v.getFloat(lo + j).toDouble
          val u = if (norm == 0.0) x else x / norm
          dot += cw(j) * u
          j += 1
        }
        out(s * codes + c) = dot.toFloat
        c += 1
      }
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj(
      "booksRef", booksRef, classOf[RefTable[_]].getName)
    val bRef = ctx.addMutableState("double[][][]", "lutBooksTable",
      v => s"$v = (double[][][]) $refName.value();")
    nullSafeCodeGen(ctx, ev, v => {
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val codes = ctx.freshName("codes")
      val nn = ctx.freshName("nn")
      val norm = ctx.freshName("norm")
      val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val cb = ctx.freshName("cb")
      val c = ctx.freshName("c")
      val cw = ctx.freshName("cw")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      s"""
         |int $d = $v.numElements();
         |int $m = $bRef.length;
         |int $codes = $bRef[0].length;
         |double $nn = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  double xv = (double) $v.getFloat($i); $nn += xv * xv;
         |}
         |double $norm = java.lang.Math.sqrt($nn);
         |int $w = ($d + $m - 1) / $m;
         |float[] $out = new float[$m * $codes];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $lo = $s * $w;
         |  int $hi = java.lang.Math.min($lo + $w, $d);
         |  double[][] $cb = $bRef[$s];
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $cw = $cb[$c];
         |    int $n = java.lang.Math.min($cw.length, java.lang.Math.max($hi - $lo, 0));
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double xv = (double) $v.getFloat($lo + $j);
         |      double uv = ($norm == 0.0) ? xv : xv / $norm;
         |      $dot += $cw[$j] * uv;
         |    }
         |    $out[$s * $codes + $c] = (float) $dot;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  /** Inline-table convenience for small codebooks. */
  def apply(child: Expression, books: Array[Array[Array[Double]]]): PqLut =
    PqLut(child, InlineRef(books))
}
