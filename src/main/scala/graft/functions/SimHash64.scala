package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Single-pass SimHash kernel called from generated code: one token hash
  * per token, all 64 bit-counters updated in the same pass. (The Column
  * -combinator form of this computation re-walked the token array once per
  * bit and re-hashed each token 64× — measured ~20× slower.)
  *
  * The token hash is a char polynomial (mod 2^64) followed by an
  * arithmetic-only mixer — two rounds of `h += h >>> 33; h *= C` with a
  * final down-mix. This is deliberate, like [[PolyFingerprintUtil]]: every
  * step is add / multiply / integer-divide mod 2^64, so the identical
  * computation runs as plain SQL in DuckDB (HUGEINT arithmetic — the
  * mixer constant is < 2^62, keeping every 128-bit product inside
  * HUGEINT range) and the gate query hash-verifies cross-engine instead
  * of rows-only. The down-mix (`h += h >>> 33`) propagates high bits into
  * low ones and the odd-constant multiply propagates low into high, so
  * short tokens still fill all 64 bits. Char codes are UTF-16 units
  * (= code points for BMP text, matching DuckDB `unicode()`).
  */
object SimHashUtil {
  /** Mixer constant (xorshift* multiplier), < 2^62 so a DuckDB HUGEINT
    * product of (2^64-1) · C stays below 2^127.
    */
  final val C = 0x2545F4914F6CDD1DL

  def tokenHash(s: String): Long = {
    var h = 0L
    var j = 0
    while (j < s.length) { h = h * 131L + s.charAt(j); j += 1 }
    h += h >>> 33
    h *= C
    h += h >>> 33
    h *= C
    h += h >>> 33
    h
  }

  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Catalyst expression for the 64-bit SimHash of an `array<string>`. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
