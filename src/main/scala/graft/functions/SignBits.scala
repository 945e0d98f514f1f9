package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Single-pass random-hyperplane sign-bit kernel called from generated
  * code.
  *
  * Bit p is the sign of Σ_j vec(j) · plane(p, j), where plane components
  * are derived from xxhash64 exactly like the Column form they replace
  * (`Similarity.lshBitsColumnForm`): hash ints p then j with Spark's
  * xxhash64 chaining (seed 42), pmod into [0, 100000), scale to
  * [-0.5, 0.5). The Column form ran one interpreted zip_with + aggregate
  * per plane — thousands of interpreted lambda evaluations per row; this
  * kernel is two tight loops. A null vector element poisons the running
  * sum exactly like `x * y → null` does in zip_with: that plane's bit
  * becomes 0.
  */
object SignBitsUtil {
  def signBits(vec: ArrayData, nPlanes: Int, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val hp = XXH64.hashInt(p, 42L)
      var s = 0.0d
      var poisoned = false
      var j = 0
      while (j < n && !poisoned) {
        if (vec.isNullAt(j)) poisoned = true
        else {
          val h = XXH64.hashInt(j, hp)
          val comp = java.lang.Math.floorMod(h, 100000L).toDouble / 100000.0d - 0.5d
          val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
          s += x * comp
        }
        j += 1
      }
      out(p) = if (!poisoned && s >= 0.0d) 1L else 0L
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: sign bits of an `array<float>` over `nPlanes`
  * recomputable pseudo-random hyperplanes, as `array<bigint>` of 0/1.
  */
case class SignBits(child: Expression, nPlanes: Int) extends UnaryExpression {
  require(nPlanes >= 1, "need at least one hyperplane")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // reading a double array through getFloat would yield silent garbage
  // bits — validate like CosineSim and dispatch on the element type
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"SignBits expects array<float> or array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SignBitsUtil.signBits(input.asInstanceOf[ArrayData], nPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignBitsUtil.signBits($c, $nPlanes, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}
