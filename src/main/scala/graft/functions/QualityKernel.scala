package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass document-quality kernel called from generated code.
  *
  * Field-for-field identical to the Column form it replaces
  * (`TextAnalysis.qualityFeaturesColumnForm`), which tokenized the
  * document once per feature (six subexpressions each embedding the
  * split). One scan over code points computes every counter:
  *
  *  - n_chars: code points (Spark `length`);
  *  - n_tokens / mean_token_len: ASCII-regex-whitespace tokens, length in
  *    code points, mean over max(n_tokens, 1);
  *  - stopword_ratio: ROOT-lowercased membership in
  *    [[TextAnalysis.stopwords]] over max(n_tokens, 1);
  *  - punct_ratio / alpha_ratio: `[^\p{L}\p{N}\s]` / `[\p{L}]` code-point
  *    counts over max(n_chars, 1) — \p{L} is Character.isLetter's exact
  *    category set, \p{N} is Nd|Nl|No, \s is ASCII-only as in Java regex.
  */
object QualityUtil {
  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextAnalysis.stopwords.foreach(s.add)
    s
  }

  private def isSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def isNumberCat(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  def features(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    var nChars = 0L; var punct = 0L; var alpha = 0L
    var nTok = 0L; var sumTokLen = 0L; var stopHits = 0L
    var tokStart = -1  // UTF-16 offset of current token, -1 = in whitespace
    var tokLen = 0L    // code points in current token
    var i = 0
    def endToken(endIdx: Int): Unit = if (tokStart >= 0) {
      nTok += 1
      sumTokLen += tokLen
      val tok = s.substring(tokStart, endIdx).toLowerCase(java.util.Locale.ROOT)
      if (stopSet.contains(tok)) stopHits += 1
      tokStart = -1; tokLen = 0L
    }
    while (i < len) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isSpace(cp)) endToken(i)
      else {
        if (tokStart < 0) tokStart = i
        tokLen += 1
        if (Character.isLetter(cp)) alpha += 1
        else if (!isNumberCat(cp)) punct += 1
      }
      i += Character.charCount(cp)
    }
    endToken(len)
    val nTokD = math.max(nTok, 1L).toDouble
    val nCharsD = math.max(nChars, 1L).toDouble
    new GenericInternalRow(Array[Any](
      nChars, nTok, sumTokLen.toDouble / nTokD, stopHits.toDouble / nTokD,
      punct.toDouble / nCharsD, alpha.toDouble / nCharsD))
  }
}

/** Catalyst expression: document-quality feature struct, one pass. */
case class QualityFeaturesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType),
    StructField("n_tokens", LongType),
    StructField("mean_token_len", DoubleType),
    StructField("stopword_ratio", DoubleType),
    StructField("punct_ratio", DoubleType),
    StructField("alpha_ratio", DoubleType)))

  override def nullSafeEval(input: Any): Any =
    QualityUtil.features(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityUtil.features($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityFeaturesExpr =
    copy(child = newChild)
}
