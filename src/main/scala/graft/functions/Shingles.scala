package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernel called from generated code.
  *
  * Semantically identical to the Column form it replaces
  * (`array_distinct(transform(sequence(1, m-n+1), i -> concat_ws(" ",
  * slice(toks, i, n))))`): space-joined n-grams in first-occurrence order,
  * empty when the document has fewer than n tokens. The Column form
  * re-evaluates the `toks` argument inside the `slice` lambda once per
  * shingle position (higher-order-function lambdas re-evaluate their
  * argument expressions per element), so shingling a document cost
  * O(tokens²); this kernel walks the token array once.
  */
object ShingleUtil {
  private val space = UTF8String.fromString(" ")

  def shingleSet(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        // tokens come from a length-filtered split: never null
        window(j) = toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}

/** Catalyst expression: distinct space-joined word n-grams of an
  * `array<string>`, one pass, first-occurrence order.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleSet(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingleSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}
