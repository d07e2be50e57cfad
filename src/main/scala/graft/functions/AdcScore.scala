package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression: PQ asymmetric-distance (ADC) score —
  * sum over subspaces of the query's LUT entry for the row's code.
  *
  * This is the INNER SCAN of the billion-vector path
  * ([[graft.ops.ProductQuantization.ivfPqTopK]]): every
  * (query, candidate) row is m table lookups against a corpus stored
  * as m bytes/vector, and the row count is Q * nProbe * cellSize —
  * the single hottest loop in the ANN family. The Scala UDF it
  * replaces boxed a Seq[Int] and hashed a Scala Map per row; this
  * expression reads the code array from UnsafeArrayData and resolves
  * the LUT through a java.util.HashMap reference, all inside
  * whole-stage codegen.
  *
  * `luts` maps query id → [sub][code] float tables, carried as a
  * [[RefTable]] (inline below the byte cap, broadcast above — a large
  * query batch's LUTs otherwise ride every task binary). An id missing
  * from the map is a construction bug upstream (probe pairs and LUTs
  * are built from the same rows) and fails loudly.
  */
case class AdcScore(
    left: Expression,
    right: Expression,
    lutsRef: RefTable[java.util.HashMap[java.lang.Long, Array[Array[Float]]]])
    extends BinaryExpression {

  @transient private lazy val luts: java.util.HashMap[java.lang.Long, Array[Array[Float]]] =
    lutsRef.value

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, array<int>), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_score"

  override protected def nullSafeEval(q: Any, c: Any): Any = {
    val qid = q.asInstanceOf[Long]
    val cs = c.asInstanceOf[ArrayData]
    val lut = luts.get(qid)
    if (lut == null)
      throw new IllegalStateException(s"AdcScore: no LUT for query id $qid")
    var s = 0.0
    var sub = 0
    val n = math.min(lut.length, cs.numElements())
    while (sub < n) { s += lut(sub)(cs.getInt(sub)); sub += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj(
      "lutsRef", lutsRef, classOf[RefTable[_]].getName)
    val mapRef = ctx.addMutableState("java.util.HashMap", "lutsTable",
      v => s"$v = (java.util.HashMap) $refName.value();")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val lut = ctx.freshName("lut")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val n = ctx.freshName("n")
      s"""
         |float[][] $lut = (float[][]) $mapRef.get(java.lang.Long.valueOf($q));
         |if ($lut == null)
         |  throw new java.lang.IllegalStateException("AdcScore: no LUT for query id " + $q);
         |double $s = 0.0;
         |int $n = java.lang.Math.min($lut.length, $c.numElements());
         |for (int $sub = 0; $sub < $n; $sub++) {
         |  $s += $lut[$sub][$c.getInt($sub)];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  /** Inline-table convenience for small LUT maps. */
  def apply(left: Expression, right: Expression,
      luts: java.util.HashMap[java.lang.Long, Array[Array[Float]]]): AdcScore =
    AdcScore(left, right, InlineRef(luts))
}
