package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization.
  *
  * Canonical-composition normalization is the first transform of every
  * text-curation pipeline — the same user-visible string arrives from
  * different crawls as precomposed (U+00E9) or decomposed (e + U+0301)
  * code points, and every downstream identity (exact dedup hashes,
  * line dedup, shingles, tokenizer merges) silently fractures if the
  * two forms are left distinct. Unicode defines exactly one answer
  * (UAX #15), so unlike lossy cleanup heuristics this is safe to apply
  * unconditionally.
  *
  * As an Expression (not a Scala UDF) the whole filter/projection
  * stage stays in WholeStageCodegen: no row SerDe, no closure
  * dispatch; the generated code calls the static [[NfcNormalize.nfc]]
  * kernel, which short-circuits on the dominant case — a string
  * already in NFC (all-ASCII text always is) returns the INPUT
  * UTF8String without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
