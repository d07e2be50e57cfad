package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge for registering COMPOSED
  * column expressions (chains of built-in functions, e.g.
  * [[graft.ops.HtmlExtract.extractText]]) as SQL functions: the
  * function-registry builder receives child `Expression`s and must
  * return an `Expression`, while the ops are written against the
  * public `Column` API. Spark's own conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`
  * at the Scala level but public bytecode — invoked reflectively
  * (resolved once, then plain MethodHandle-speed calls; this runs at
  * PLAN construction, never per row).
  */
private[graft] object ColumnBridge {
  private val module: AnyRef = {
    val cls = Class.forName("org.apache.spark.sql.classic.ExpressionUtils$")
    cls.getField("MODULE$").get(null)
  }
  private val toColumnM =
    module.getClass.getMethod("column", classOf[Expression])

  // Column -> ColumnNode -> eager catalyst conversion. ExpressionUtils
  // .expression would instead wrap the node in a LAZY
  // ColumnNodeExpression, which the analyzer never unwraps when the
  // expression is spliced in by a function-registry builder (it
  // surfaces at codegen as "Cannot generate code for expression") —
  // the converter produces plain (unresolved) catalyst functions the
  // analyzer's normal fixpoint then resolves.
  private val converter: AnyRef = {
    val cls = Class.forName("org.apache.spark.sql.classic.ColumnNodeToExpressionConverter$")
    cls.getField("MODULE$").get(null)
  }
  private val convertM = converter.getClass.getMethods
    .find(m => m.getName == "apply" &&
      m.getParameterTypes.sameElements(Array(Class.forName("org.apache.spark.sql.internal.ColumnNode"))))
    .getOrElse(throw new NoSuchMethodException("ColumnNodeToExpressionConverter.apply"))
  private val nodeM = classOf[Column].getMethod("node")

  def toColumn(e: Expression): Column =
    toColumnM.invoke(module, e).asInstanceOf[Column]
  def toExpression(c: Column): Expression =
    convertM.invoke(converter, nodeM.invoke(c)).asInstanceOf[Expression]
}
