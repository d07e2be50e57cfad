package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: index of the squared-L2-nearest codeword
  * for a subvector, against the codebook of its subspace — the
  * assignment kernel of every PQ training iteration
  * ([[graft.ops.ProductQuantization.trainCodebooks]]).
  *
  * The training frame is one row per (vector, subspace) — N*m rows per
  * Lloyd iteration — and the Scala UDF it replaces converted each
  * subvector to a boxed Seq[Double] before the distance loop. Matching
  * the original `nearestCode` bit for bit: distance over the common
  * prefix, strict `<` so the first best code wins.
  */
case class NearestSubCode(
    left: Expression,
    right: Expression,
    booksRef: RefTable[Array[Array[Array[Double]]]])
    extends BinaryExpression {

  @transient private lazy val books: Array[Array[Array[Double]]] = booksRef.value

  require(booksRef.value.nonEmpty, "NearestSubCode needs at least one sub-codebook")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, array<double>), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_subcode"

  override protected def nullSafeEval(s: Any, v: Any): Any = {
    val sub = s.asInstanceOf[Int]
    val sv = v.asInstanceOf[ArrayData]
    val cb = books(sub)
    val len = sv.numElements()
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cb.length) {
      val w = cb(c)
      val n = math.min(w.length, len)
      var d = 0.0
      var i = 0
      while (i < n) { val t = w(i) - sv.getDouble(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj(
      "booksRef", booksRef, classOf[RefTable[_]].getName)
    val bRef = ctx.addMutableState("double[][][]", "booksTable",
      v => s"$v = (double[][][]) $refName.value();")
    nullSafeCodeGen(ctx, ev, (s, v) => {
      val cb = ctx.freshName("cb")
      val len = ctx.freshName("len")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |double[][] $cb = $bRef[$s];
         |int $len = $v.numElements();
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  double[] $w = $cb[$c];
         |  int $n = java.lang.Math.min($w.length, $len);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double tv = $w[$i] - $v.getDouble($i);
         |    $d += tv * tv;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestSubCode =
    copy(left = newLeft, right = newRight)
}

object NearestSubCode {
  /** Inline-table convenience for small codebooks. */
  def apply(left: Expression, right: Expression,
      books: Array[Array[Array[Double]]]): NearestSubCode =
    NearestSubCode(left, right, InlineRef(books))
}
