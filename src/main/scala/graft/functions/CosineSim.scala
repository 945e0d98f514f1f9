package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Single-pass cosine-similarity kernel called from generated code: dot
  * product and both norms accumulated in one walk over the arrays, no
  * intermediate array allocation. The Column-combinator form
  * (`aggregate(zip_with(...))` three times) is evaluated interpreted —
  * higher-order functions never enter whole-stage codegen — and allocates a
  * zipped struct array per pair; on candidate-verification joins that walk
  * hundreds of thousands of pairs it dominated the query time.
  *
  * Null contract (mirrors the HOF form it replaces): null when lengths
  * differ, when any element is null, or when either norm is zero (the
  * `try_divide` behavior — one corrupt embedding must not kill a 100 TB
  * job; null scores drop out of top-k and thresholds).
  */
object CosineUtil {
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0d) null else java.lang.Double.valueOf(dot / denom)
  }
}

/** Catalyst expression: cosine similarity of two `array<float|double>`
  * columns, codegen'd to a single [[CosineUtil.cosine]] call.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"CosineSim expects array<float> or array<double>, got $other")
  }
  private lazy val aFloat = isFloat(left)
  private lazy val bFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""
         |java.lang.Double $tmp = graft.functions.CosineUtil.cosine($a, $b, $aFloat, $bFloat);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
