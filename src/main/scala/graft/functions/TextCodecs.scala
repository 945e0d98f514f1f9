package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kusto's string⇄array codec scalars:
  * `unicode_codepoints_from_string` / `unicode_codepoints_to_string` and
  * `base64_decode_toarray` / `base64_encode_fromarray`.
  *
  * Codepoints are true Unicode scalar values (astral chars are ONE
  * codepoint, not a surrogate pair — `String.codePoints()`); byte arrays
  * carry unsigned values 0–255 as longs (the engine's dynamic int).
  * Invalid input (codepoint out of range / surrogate half, malformed
  * base64) is a row error ⇒ null, the engine's error policy.
  */
object TextCodecsUtil {
  def codePoints(s: UTF8String): ArrayData = {
    if (s == null) return null
    val it = s.toString.codePoints().iterator()
    val buf = scala.collection.mutable.ArrayBuffer[Any]()
    while (it.hasNext) buf += it.next().toLong
    new GenericArrayData(buf.toArray)
  }

  def fromCodePoints(a: ArrayData): UTF8String = {
    if (a == null) return null
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) return null
      val cp = a.getLong(i)
      // reject out-of-range and lone surrogates (not scalar values)
      if (cp < 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return null
      sb.appendCodePoint(cp.toInt)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def base64ToArray(s: UTF8String): ArrayData = {
    if (s == null) return null
    try {
      val bytes = java.util.Base64.getDecoder.decode(s.toString)
      val out = new Array[Any](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = (bytes(i) & 0xFF).toLong; i += 1 }
      new GenericArrayData(out)
    } catch { case _: IllegalArgumentException => null }
  }

  /** IDNA/punycode domain codecs (Kusto `punycode_domain_from_string` /
    * `punycode_domain_to_string`), via the JDK's `java.net.IDN`
    * (RFC 3490). Per-label processing is IDN's own; undecodable input is
    * a row error ⇒ null.
    */
  def punycodeDecode(s: UTF8String): UTF8String = {
    if (s == null) return null
    try UTF8String.fromString(java.net.IDN.toUnicode(s.toString))
    catch { case _: IllegalArgumentException => null }
  }

  def punycodeEncode(s: UTF8String): UTF8String = {
    if (s == null) return null
    try UTF8String.fromString(java.net.IDN.toASCII(s.toString))
    catch { case _: IllegalArgumentException => null }
  }

  /** Kusto `to_utf8`: the string's UTF-8 bytes as a dynamic array of
    * unsigned byte values (round 9). */
  def utf8Bytes(s: UTF8String): ArrayData = {
    if (s == null) return null
    val bytes = s.getBytes
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = (bytes(i) & 0xFF).toLong; i += 1 }
    new GenericArrayData(out)
  }

  def arrayToBase64(a: ArrayData): UTF8String = {
    if (a == null) return null
    val bytes = new Array[Byte](a.numElements())
    var i = 0
    while (i < bytes.length) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      if (v < 0 || v > 255) return null // not a byte value
      bytes(i) = v.toByte
      i += 1
    }
    UTF8String.fromString(java.util.Base64.getEncoder.encodeToString(bytes))
  }
}

/** Kusto's plain `countof`: OVERLAPPING occurrence count (countof('aaa',
  * 'aa') = 2) — a per-position scan no replace-length trick expresses.
  * Empty search is rejected at parse time; null operands → null. */
object CountOfUtil {
  def overlapping(s: UTF8String, sub: UTF8String): Long = {
    if (s == null || sub == null) return -1L // callers null-guard; sentinel
    val str = s.toString
    val needle = sub.toString
    // indexOf("", i) clamps to str.length instead of returning -1, so an
    // empty needle (a computed expression, not a literal — the parser
    // rejects those) would loop forever. Kusto: countof(x, '') == 0.
    if (needle.isEmpty) return 0L
    var i = 0
    var n = 0L
    while (i >= 0 && i <= str.length - needle.length) {
      i = str.indexOf(needle, i)
      if (i >= 0) { n += 1; i += 1 }
    }
    n
  }
}

/** Catalyst expression for overlapping countof. */
case class CountOfOverlap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    CountOfUtil.overlapping(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.CountOfUtil.overlapping($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountOfOverlap =
    copy(left = newLeft, right = newRight)
}

/** Catalyst expression for the four codecs — `op` picks the static helper;
  * codegen is a direct static call like the other kernels. */
case class TextCodecExpr(child: Expression, op: String) extends UnaryExpression {
  override def dataType: DataType = op match {
    case "cp_from" | "b64_to_arr" | "utf8_bytes" => ArrayType(LongType)
    case _ => StringType
  }
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = op match {
    case "cp_from" => TextCodecsUtil.codePoints(input.asInstanceOf[UTF8String])
    case "cp_to" => TextCodecsUtil.fromCodePoints(input.asInstanceOf[ArrayData])
    case "b64_to_arr" => TextCodecsUtil.base64ToArray(input.asInstanceOf[UTF8String])
    case "utf8_bytes" => TextCodecsUtil.utf8Bytes(input.asInstanceOf[UTF8String])
    case "b64_from_arr" => TextCodecsUtil.arrayToBase64(input.asInstanceOf[ArrayData])
    case "puny_from" => TextCodecsUtil.punycodeDecode(input.asInstanceOf[UTF8String])
    case "puny_to" => TextCodecsUtil.punycodeEncode(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = op match {
      case "cp_from" => "codePoints"
      case "cp_to" => "fromCodePoints"
      case "b64_to_arr" => "base64ToArray"
      case "utf8_bytes" => "utf8Bytes"
      case "b64_from_arr" => "arrayToBase64"
      case "puny_from" => "punycodeDecode"
      case "puny_to" => "punycodeEncode"
    }
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextCodecsUtil.$m($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): TextCodecExpr =
    copy(child = newChild)

  override def prettyName: String = op
}
