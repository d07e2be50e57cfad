package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: PQ asymmetric-distance (ADC) score —
  * sum over subspaces of the query's LUT entry for the row's code.
  *
  * This is the INNER SCAN of the billion-vector path
  * ([[graft.ops.AnnIndex.topKPq]],
  * [[graft.ops.ProductQuantization.ivfPqTopK]]): every
  * (query, candidate) row is m table lookups against a corpus stored
  * as m bytes/vector, and the row count is Q * nProbe * cellSize —
  * the single hottest loop in the ANN family.
  *
  * The LUT arrives as a COLUMN (`array<float>` of length
  * `m * codesPerSub`, flattened row-major — what [[PqLut]] emits on
  * the query frame and the probe join fans out per candidate row), not
  * as a driver-built map keyed by query id: the per-query table build
  * is distributed work on the query frame, nothing about the query
  * batch ever funnels through the driver, and the generated loop is
  * two array reads + an add per subspace inside whole-stage codegen.
  */
case class AdcScore(left: Expression, right: Expression, codesPerSub: Int)
    extends BinaryExpression {

  require(codesPerSub >= 1, s"codesPerSub must be >= 1: $codesPerSub")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<int>), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_score"

  override protected def nullSafeEval(l: Any, c: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val cs = c.asInstanceOf[ArrayData]
    var s = 0.0
    var sub = 0
    val n = math.min(lut.numElements() / codesPerSub, cs.numElements())
    while (sub < n) {
      val code = cs.getInt(sub)
      // Out-of-range codes fail LOUDLY: a silent read would fold
      // another subspace's entry (or bytes past the array end —
      // UnsafeArrayData does not bounds-check) into the score. The
      // usual cause is probing a sidecar written by a build with a
      // different `codes` count.
      if (code < 0 || code >= codesPerSub)
        throw new IllegalStateException(
          s"AdcScore: code $code out of range [0, $codesPerSub) at subspace $sub " +
            "— pqcodes and codebooks disagree (stale sidecar?)")
      s += lut.getFloat(sub * codesPerSub + code)
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) => {
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val n = ctx.freshName("n")
      val code = ctx.freshName("code")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($l.numElements() / $codesPerSub, $c.numElements());
         |for (int $sub = 0; $sub < $n; $sub++) {
         |  int $code = $c.getInt($sub);
         |  if ($code < 0 || $code >= $codesPerSub)
         |    throw new java.lang.IllegalStateException(
         |      "AdcScore: code " + $code + " out of range [0, " + $codesPerSub +
         |      ") at subspace " + $sub + " - pqcodes and codebooks disagree (stale sidecar?)");
         |  $s += $l.getFloat($sub * $codesPerSub + $code);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}
