package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid (by
  * cosine) for a float-array vector, against a fixed center table.
  *
  * The assignment kernel of every Lloyd iteration, the IVF coarse
  * quantizer, and the SemDeDup cell assignment — O(k * dim) per row
  * over the whole corpus, the hot pass of the clustering family. A
  * Scala UDF here converts each row's vector to a boxed Seq[Float]
  * before the arithmetic even starts; this expression reads the
  * UnsafeArrayData directly and generates a tight primitive loop,
  * keeping the stage in whole-stage codegen (measured ~3x on the
  * 200k x 64 assignment pass).
  *
  * `centers` travel as a [[RefTable]]: inline in the expression below
  * the 4 MiB cap (k * dim doubles — bounded by the same driver-collect
  * that produced them), torrent-broadcast above it so a 10^5-cell
  * table never rides every stage's task binary; generated code
  * materializes the array once per operator in `init`.
  * Scoring matches [[graft.ops.Clustering]]'s original UDF bit for
  * bit: per-center dot and vector norm over the common prefix, unit
  * centers assumed, zero-norm vectors score 0, strict `>` so the
  * first best index wins.
  */
case class NearestCentroid(child: Expression, centersRef: RefTable[Array[Array[Double]]])
    extends UnaryExpression {

  @transient private lazy val centers: Array[Array[Double]] = centersRef.value

  require(centersRef.value.nonEmpty, "NearestCentroid needs at least one center")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val len = v.numElements()
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centers.length) {
      val center = centers(c)
      val n = math.min(center.length, len)
      var dot = 0.0; var nv = 0.0
      var i = 0
      while (i < n) {
        val xi = v.getFloat(i).toDouble
        dot += center(i) * xi; nv += xi * xi
        i += 1
      }
      val s = if (nv == 0.0) 0.0 else dot / math.sqrt(nv)
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj(
      "centersRef", centersRef, classOf[RefTable[_]].getName)
    // materialized ONCE per operator instance in init — the row loop
    // touches a plain double[][], never Broadcast.value
    val cRef = ctx.addMutableState("double[][]", "centersTable",
      v => s"$v = (double[][]) $refName.value();")
    nullSafeCodeGen(ctx, ev, v => {
      val len = ctx.freshName("len")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val center = ctx.freshName("center")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $len = $v.numElements();
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] $center = $cRef[$c];
         |  int $n = java.lang.Math.min($center.length, $len);
         |  double $dot = 0.0, $nv = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xv = (double) $v.getFloat($i);
         |    $dot += $center[$i] * xv; $nv += xv * xv;
         |  }
         |  double $s = ($nv == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nv);
         |  if ($s > $bestScore) { $bestScore = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Inline-table convenience for small center sets. */
  def apply(child: Expression, centers: Array[Array[Double]]): NearestCentroid =
    NearestCentroid(child, InlineRef(centers))
}
