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

  /** Theil–Sen pair statistics over one series' sorted integer prefix
    * (`array<struct<x:bigint, y:bigint>>`, x strictly increasing): all
    * `n·(n−1)/2` pair slopes in one compiled loop, sorted with
    * `Arrays.sort(double[])` (the same −0.0 < +0.0, NaN-last total order
    * `array_sort` and Spark's Percentile key ordering use), then the
    * median via Percentile's OWN interpolation — the two-sided weighted
    * `lo·(⌈p⌉−p) + hi·(p−⌊p⌋)` (exact element on an odd count), which a
    * 540-case ULP-adversarial probe showed is the ONLY form bitwise equal
    * to `percentile(..., 0.5)`; the lower-anchored `lo + (hi−lo)·f`
    * rewrite diverges in the last ulp. Returns null when fewer than two
    * points exist (no pairs).
    *
    * This kernel replaces an interpreted `percentile` aggregation that
    * measured ~7× the cost of the entire rest of the query plan
    * (ObjectHashAggregate + boxed-counts buffer over the pair fan-out);
    * here the pairs never leave the row.
    */
  def theilSenStats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    if (n < 2) return null
    // n·(n−1)/2 pair slopes materialize per row: past 65536 points the Int
    // pair count overflows (and the ~2 billion-double sort is not a
    // per-row operation anyway) — fail loudly, never wrap silently
    if (n > 65536) throw new IllegalArgumentException(
      s"theil_sen_stats: $n points => ${n.toLong * (n - 1) / 2} pair slopes " +
        "per row; cap the prefix at 65536 points (Smooth.theilSen maxPoints)")
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      xs(i) = r.getLong(0)
      ys(i) = r.getLong(1)
      i += 1
    }
    val m = n * (n - 1) / 2
    val s = new Array[Double](m)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        s(k) = (ys(j) - ys(i)).toDouble / (xs(j) - xs(i)).toDouble
        k += 1
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(s)
    val pos = 0.5 * (m - 1)
    val lower = math.floor(pos).toInt
    val higher = math.ceil(pos).toInt
    val med =
      if (lower == higher) s(lower)
      else s(lower) * (higher - pos) + s(higher) * (pos - lower)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m.toLong, med))
  }
}

/** `theil_sen_stats(prefix)`: `(n_pairs, slope)` of the Theil–Sen
  * estimator over a sorted `array<struct<x:bigint, y:bigint>>` prefix —
  * [[SeriesImpl.theilSenStats]] compiled per row; null under two points.
  */
case class TheilSenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_pairs", LongType, nullable = false),
    StructField("slope", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "theil_sen_stats"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(fx, fy)), _)
          if fx.dataType == LongType && fy.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"theil_sen_stats expects array<struct<bigint,bigint>>, got " +
            s"${other.simpleString(10)}")
    }

  override def nullSafeEval(input: Any): Any =
    SeriesImpl.theilSenStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $res =
         |  graft.functions.SeriesImpl.theilSenStats($a);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

  def theil_sen_stats(prefix: Column): Column =
    GraftExpressionBridge.column(TheilSenStats(
      GraftExpressionBridge.expression(prefix)))

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
