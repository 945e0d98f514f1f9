package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-based whole-phrase search used by the generated code — ASCII-alnum
  * word boundaries exactly as the reference defines them
  * (`miso-workflow/src/interpreter/string_ops.rs:43-112`: boundary =
  * any char outside [A-Za-z0-9]).
  */
object StringSearch {
  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Called from whole-stage generated code. */
  def hasPhrase(str: UTF8String, phrase: UTF8String, caseSensitive: Boolean): Boolean = {
    if (phrase.numChars() == 0) return true // empty phrase matches (ref :44-49)
    val s = if (caseSensitive) str.toString else str.toString.toLowerCase(java.util.Locale.ROOT)
    val p = if (caseSensitive) phrase.toString else phrase.toString.toLowerCase(java.util.Locale.ROOT)
    var idx = s.indexOf(p)
    while (idx >= 0) {
      val leftOk = idx == 0 || !isAlnum(s.charAt(idx - 1))
      val end = idx + p.length
      val rightOk = end >= s.length || !isAlnum(s.charAt(end))
      if (leftOk && rightOk) return true
      idx = s.indexOf(p, idx + 1)
    }
    false
  }
}

/** Native Catalyst expression for KQL `has`/`has_cs`: stays inside
  * whole-stage codegen (the generated code is a static call — no regex
  * compilation, no CodegenFallback row boxing). Preferred over the regex
  * lowering for hot filter paths.
  */
case class HasPhrase(left: Expression, right: Expression, caseSensitive: Boolean)
    extends BinaryExpression with Predicate {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(str: Any, phrase: Any): Any =
    StringSearch.hasPhrase(
      str.asInstanceOf[UTF8String], phrase.asInstanceOf[UTF8String], caseSensitive)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.StringSearch.hasPhrase($l, $r, $caseSensitive)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HasPhrase =
    copy(left = newLeft, right = newRight)
}
