package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

import graft.windowing.WindowingSpec

/** Native Catalyst expression: decay-window index of element rank
  * `seq` in a stream of `n` elements under the stream's windowing
  * policy — the per-row kernel of [[graft.core.Summarizer]], i.e. the
  * single most-executed expression in the engine (once per ingested
  * event, 10^9+ rows in the deep-scale anchors).
  *
  * The Scala-UDF form boxed three Longs per row and allocated a
  * tuple key into the [[graft.windowing.DecayModel.windowStarts]]
  * memo per row; this expression generates a static primitive-arg
  * call that resolves the starts array through a per-thread last-hit
  * memo (streams arrive contiguously after the count join, so the
  * common case is two long compares) and binary-searches inline.
  * Decision parity with the UDF is bit-exact: same windowStarts
  * arrays, same upper-bound search ([[WindowIdSpec]] asserts
  * interpreted == codegen == UDF on random streams).
  *
  * `specOf` ships inside the expression exactly as it shipped inside
  * the UDF closure: it must be self-contained and serializable.
  */
case class WindowId(
    streamId: Expression,
    n: Expression,
    seq: Expression,
    specOf: Long => WindowingSpec,
    bufferSize: Long)
    extends TernaryExpression {

  override def first: Expression = streamId
  override def second: Expression = n
  override def third: Expression = seq

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(streamId, n, seq).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint, bigint), got " +
        Seq(streamId, n, seq).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_window_id"

  override protected def nullSafeEval(sid: Any, nn: Any, s: Any): Any =
    graft.windowing.DecayModel.windowIdJ(
      specOf, bufferSize, sid.asInstanceOf[Long], nn.asInstanceOf[Long], s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fnRef = ctx.addReferenceObj("specOf", specOf, "scala.Function1")
    nullSafeCodeGen(ctx, ev, (sid, nn, s) =>
      s"""
         |${ev.value} = graft.windowing.DecayModel.windowIdJ(
         |  (scala.Function1) $fnRef, ${bufferSize}L, $sid, $nn, $s);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WindowId =
    copy(streamId = newFirst, n = newSecond, seq = newThird)
}

object WindowId {
  /** Column-API form — the drop-in replacement for the historical
    * `udf((sid, n, seq) => windowIdOf(windowStarts(...), seq))` at
    * every summarize/compact call site.
    */
  def column(
      specOf: Long => WindowingSpec,
      bufferSize: Long,
      streamId: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column,
      seq: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.toColumn(WindowId(
      ColumnBridge.toExpression(streamId),
      ColumnBridge.toExpression(n),
      ColumnBridge.toExpression(seq),
      specOf, bufferSize))
}
