package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Native kernels for window-frame series math.
  *
  * The EWMA fold ran as `aggregate(zip_with(...))` twice per row —
  * interpreted per element, the hot path of the smoothing family. The
  * kernel computes the numerator and denominator in ONE compiled loop per
  * row, left-to-right in frame order with the same `Math.pow` weights, so
  * every double is bit-identical to the HOF form it replaces (spec-pinned).
  */
object SeriesImpl {

  /** Weighted fold over a frame of nullable doubles boxed as single-field
    * structs (`collect_list(struct(v))` — the boxing keeps null POSITIONS,
    * which carry weight but contribute to neither sum). Returns null when
    * no non-null observation is in the frame.
    */
  def ewmaFold(arr: ArrayData, decay: Double): java.lang.Double = {
    val n = arr.numElements()
    var num = 0.0
    var den = 0.0
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 1)
      if (!row.isNullAt(0)) {
        val w = java.lang.Math.pow(decay, (n - 1 - i).toDouble)
        num += row.getDouble(0) * w
        den += w
      }
      i += 1
    }
    if (den > 0.0) java.lang.Double.valueOf(num / den) else null
  }
}

/** `ewma_fold(frame, alpha)`: adjusted EWMA of a window frame of boxed
  * nullable doubles — pandas `ewm(alpha, adjust=True).mean()` truncated to
  * the frame (`Smooth.ewma` builds the frame with a bounded ROWS window).
  */
case class EwmaFold(child: Expression, alpha: Double) extends UnaryExpression {
  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
  private val decay = 1.0 - alpha
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewma_fold"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(f)), _) if f.dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ewma_fold expects array<struct<double>>, got ${other.simpleString(10)}")
    }

  override def nullSafeEval(input: Any): Any =
    SeriesImpl.ewmaFold(input.asInstanceOf[ArrayData], decay)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("res")
      s"""
         |java.lang.Double $res = graft.functions.SeriesImpl.ewmaFold($a, $decay);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object series {
  def ewma_fold(frame: Column, alpha: Double): Column =
    GraftExpressionBridge.column(EwmaFold(
      GraftExpressionBridge.expression(frame), alpha))

  /** SQL registration: `SELECT ewma_fold(frame, 0.1) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ewma_fold", { exprs =>
      val alpha = exprs(1) match {
        case f if f.foldable => f.eval(null) match {
          case d: Double => d
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => throw new IllegalArgumentException(
            s"alpha must be a double literal, got $other")
        }
        case _ => throw new IllegalArgumentException("alpha must be foldable")
      }
      EwmaFold(exprs(0), alpha)
    }, "built-in")
  }
}
