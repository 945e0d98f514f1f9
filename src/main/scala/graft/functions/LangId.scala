package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-ID kernel called from generated code.
  *
  * Semantically identical to the Column form it replaces
  * (`TextAnalysis.langId`): whitespace tokens, lowercased, marker-word hit
  * counts per language (duplicates counted), argmax with ties won by the
  * lexicographically greatest code, `und` when nothing hits. The Column
  * form embedded the tokenize+lower subtree in each of the six per-language
  * score structs, so every document was split and lowercased six times
  * (higher-order-function lambdas re-evaluate their argument expressions);
  * this kernel tokenizes once and does one hash-map probe per token.
  *
  * The DuckDB oracle for the gate query is generated from the same
  * [[TextAnalysis.langProfiles]] map, so profile edits stay in lock-step.
  */
object LangIdUtil {
  private val codes: Array[String] =
    TextAnalysis.langProfiles.keys.toArray.sorted
  private val nLangs = codes.length

  // marker word -> bitmask of language indexes (a word can mark several
  // languages, e.g. "de" is a marker for es, fr, and pt)
  private val markerMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    for ((code, words) <- TextAnalysis.langProfiles; w <- words) {
      val idx = codes.indexOf(code)
      val prev = Option(m.get(w)).map(_.intValue).getOrElse(0)
      m.put(w, prev | (1 << idx))
    }
    m
  }

  private def isSpace(c: Char): Boolean =
    // Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def langId(text: UTF8String): UTF8String = {
    val s = text.toString
    val counts = new Array[Int](nLangs)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        val mask = markerMask.get(tok)
        if (mask != null) {
          var b = 0
          val mv = mask.intValue
          while (b < nLangs) {
            if ((mv & (1 << b)) != 0) counts(b) += 1
            b += 1
          }
        }
      }
    }
    // ascending scan with >= : equal hit counts hand the win to the later
    // (greater) code, matching array_max over struct(hits, code)
    var bestIdx = -1
    var bestHits = 0
    var b = 0
    while (b < nLangs) {
      if (counts(b) > 0 && counts(b) >= bestHits) { bestIdx = b; bestHits = counts(b) }
      b += 1
    }
    UTF8String.fromString(if (bestIdx < 0) "und" else codes(bestIdx))
  }
}

/** Catalyst expression: language code for a text column, one pass. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LangIdUtil.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdUtil.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
