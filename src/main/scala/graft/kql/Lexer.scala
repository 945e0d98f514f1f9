package graft.kql

/** Hand-rolled KQL tokenizer (analog of `miso-kql/src/lexer.rs`, built fresh
  * for Scala). Produces a flat token vector the recursive-descent parser
  * consumes. Timespan literals are folded to microseconds at lex time.
  */
sealed trait Token { def pos: Int }
object Token {
  final case class Ident(s: String, pos: Int) extends Token
  final case class IntTok(v: Long, pos: Int) extends Token
  final case class FloatTok(v: Double, pos: Int) extends Token
  final case class StrTok(v: String, pos: Int) extends Token
  final case class TimespanTok(micros: Long, pos: Int) extends Token
  /** Punctuation / operators: | , ( ) [ ] . .. == != <= >= < > + - * / = ! $ ; */
  final case class Punct(s: String, pos: Int) extends Token
  final case class Eof(pos: Int) extends Token
}

/** One positioned diagnostic (reference `parser.rs` rich errors: message +
  * line/column + what was expected at that point).
  */
final case class ParseError(
    msg: String, pos: Int, line: Int, column: Int,
    expected: Seq[String] = Nil) {
  def render: String = {
    val exp = if (expected.isEmpty) "" else s" (expected: ${expected.mkString(", ")})"
    s"$msg at line $line, column $column$exp"
  }
}

/** Parse failure carrying every diagnostic the parser recovered past —
  * the single-error constructor form stays for compiler-side errors.
  */
final case class KqlParseException(
    msg: String, pos: Int, errors: Seq[ParseError] = Nil)
  extends RuntimeException(
    if (errors.isEmpty) s"$msg (at offset $pos)"
    else errors.map(_.render).mkString("; "))

object Lexer {
  import Token._

  private val multiCharPunct = Seq("==", "!=", "<=", ">=", "..")

  def lex(src: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        // line comment
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '"' || c == '\'') {
        val (s, next) = lexString(src, i, c)
        out += StrTok(s, i); i = next
      } else if (c.isDigit) {
        val (tok, next) = lexNumber(src, i)
        out += tok; i = next
      } else if (c.isLetter || c == '_' || c == '@') {
        val start = i
        i += 1
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        // hyphenated step keywords (mv-expand, project-rename, …): an ident
        // immediately followed by '-letter' where the combined word is a
        // known hyphen keyword.
        var word = src.substring(start, i)
        if (i < n && src.charAt(i) == '-' && i + 1 < n && src.charAt(i + 1).isLetter) {
          var j = i + 1
          while (j < n && (src.charAt(j).isLetterOrDigit || src.charAt(j) == '_')) j += 1
          val candidate = word + "-" + src.substring(i + 1, j)
          if (hyphenKeywords(candidate)) { word = candidate; i = j }
        }
        out += Ident(word, start)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (multiCharPunct.contains(two)) { out += Punct(two, i); i += 2 }
        else if ("|,()[].=!<>+-*/$;".indexOf(c) >= 0) { out += Punct(c.toString, i); i += 1 }
        else throw KqlParseException(s"unexpected character '$c'", i)
      }
    }
    out += Eof(n)
    out.result()
  }

  private val hyphenKeywords =
    Set("mv-expand", "project-rename", "project-away", "project-keep")

  private def lexString(src: String, start: Int, quote: Char): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    val n = src.length
    while (i < n && src.charAt(i) != quote) {
      val c = src.charAt(i)
      if (c == '\\' && i + 1 < n) {
        src.charAt(i + 1) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case c2 @ ('\\' | '"' | '\'') => sb += c2
          // unknown escape (e.g. \d in a regex): keep the backslash
          case other => sb += '\\'; sb += other
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    if (i >= n) throw KqlParseException("unterminated string", start)
    (sb.toString, i + 1)
  }

  /** Numbers: int, float (with `.` or exponent), or timespan (suffix
    * d/h/m/s/ms/us — folded to microseconds; `m` is minutes per KQL).
    */
  private def lexNumber(src: String, start: Int): (Token, Int) = {
    var i = start
    val n = src.length
    while (i < n && src.charAt(i).isDigit) i += 1
    var isFloat = false
    // fractional part — but NOT the `..` range operator
    if (i < n && src.charAt(i) == '.' && i + 1 < n && src.charAt(i + 1).isDigit) {
      isFloat = true
      i += 1
      while (i < n && src.charAt(i).isDigit) i += 1
    }
    if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E') &&
        i + 1 < n && (src.charAt(i + 1).isDigit || src.charAt(i + 1) == '-')) {
      isFloat = true
      i += 2
      while (i < n && src.charAt(i).isDigit) i += 1
    }
    val numText = src.substring(start, i)
    // timespan suffix?
    val sufStart = i
    while (i < n && src.charAt(i).isLetter) i += 1
    val suffix = src.substring(sufStart, i)
    val unitMicros: Option[Long] = suffix match {
      case "d"  => Some(86400L * 1000000L)
      case "h"  => Some(3600L * 1000000L)
      case "m"  => Some(60L * 1000000L)
      case "s"  => Some(1000000L)
      case "ms" => Some(1000L)
      case "us" | "micro" | "microsecond" => Some(1L)
      case ""   => None
      case other => throw KqlParseException(s"unknown numeric suffix '$other'", sufStart)
    }
    unitMicros match {
      case Some(u) =>
        val micros =
          if (isFloat) (numText.toDouble * u).toLong else numText.toLong * u
        (TimespanTok(micros, start), i)
      case None =>
        if (isFloat) (FloatTok(numText.toDouble, start), sufStart)
        else (IntTok(numText.toLong, start), sufStart)
    }
  }
}
