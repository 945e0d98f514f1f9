package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-sensitive polynomial rolling-hash document fingerprint over a
  * token array:
  *
  *   tokenHash(t) = fold over chars: th = (th·131 + code) mod 10^15
  *   fingerprint  = fold over tokens: acc = (acc·31 + tokenHash) mod 10^15
  *
  * The char-polynomial (rather than xxhash64) is deliberate: the same
  * computation is plain SQL in any engine (`list_reduce` in DuckDB), so
  * the gate query carries a real cross-engine oracle instead of a
  * rows-only check. Char codes are UTF-16 units, which equal Unicode code
  * points for all BMP text. The modulus keeps every intermediate product
  * inside 64-bit range (10^15·131 < 2^63) — no ANSI overflow.
  */
object PolyFingerprintUtil {
  final val M = 1000000000000000L

  def fingerprint(arr: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var th = 0L
        var j = 0
        while (j < s.length) { th = (th * 131L + s.charAt(j)) % M; j += 1 }
        acc = (acc * 31L + th) % M
      }
      i += 1
    }
    acc
  }
}

/** Catalyst expression: polynomial fingerprint of an `array<string>`. */
case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyFingerprintUtil.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyFingerprintUtil.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}
