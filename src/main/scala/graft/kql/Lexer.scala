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
  final case class DatetimeTok(micros: Long, pos: Int) extends Token
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
case class KqlParseException(
    msg: String, pos: Int, errors: Seq[ParseError] = Nil)
  extends RuntimeException(
    if (errors.isEmpty) s"$msg (at offset $pos)"
    else errors.map(_.render).mkString("; "))

/** Source-resolution failure (unknown table/let/view). Distinguished from
  * the general parse/semantic error class because Kusto's fuzzy-union
  * contract tolerates ONLY unresolvable branch sources — a genuinely
  * broken branch query (bad column, bad aggregate, …) must still fail
  * rather than silently dropping the branch's data. */
final class UnknownSourceException(val source: String)
  extends KqlParseException(s"unknown source '$source'", 0, Nil)

object Lexer {
  import Token._

  private val multiCharPunct =
    Seq("==", "!=", "<=", ">=", "..", "=~", "!~", "=>")

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
      } else if ((c == 'h' || c == 'H') && i + 1 < n &&
          (src.charAt(i + 1) == '"' || src.charAt(i + 1) == '\'' ||
            (src.charAt(i + 1) == '@' && i + 2 < n &&
              (src.charAt(i + 2) == '"' || src.charAt(i + 2) == '\'')))) {
        // the reference lexes h"…" byte strings and its parser rejects them
        // (parser.rs:482) — fail with the same guidance
        throw KqlParseException(
          "byte strings are currently not supported. " +
            "Use regular strings with double quotes", i)
      } else if (c == '@' && i + 1 < n &&
          (src.charAt(i + 1) == '"' || src.charAt(i + 1) == '\'')) {
        // verbatim string: no backslash escapes, quote doubled to escape
        val (s, next) = lexRawString(src, i + 1, src.charAt(i + 1))
        out += StrTok(s, i); i = next
      } else if (c == '`' && src.startsWith("```", i)) {
        val (s, next) = lexFenced(src, i, "```")
        out += StrTok(s, i); i = next
      } else if (c == '~' && src.startsWith("~~~", i)) {
        val (s, next) = lexFenced(src, i, "~~~")
        out += StrTok(s, i); i = next
      } else if (c.isDigit) {
        val (tok, next) = lexDatetime(src, i).getOrElse(lexNumber(src, i))
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
          // scan ahead across '-seg' pieces and commit to the LONGEST
          // known hyphen keyword (graph-shortest-paths has two hyphens);
          // committing only on full matches keeps `a-b` subtraction safe
          var j = i
          var cand = word
          var commitWord = word
          var commitI = i
          var segs = 0
          while (segs < 3 && j < n && src.charAt(j) == '-' &&
              j + 1 < n && src.charAt(j + 1).isLetter) {
            var k = j + 1
            while (k < n && (src.charAt(k).isLetterOrDigit || src.charAt(k) == '_')) k += 1
            cand = cand + "-" + src.substring(j + 1, k)
            j = k
            if (hyphenKeywords(cand)) { commitWord = cand; commitI = j }
            segs += 1
          }
          word = commitWord
          i = commitI
        }
        out += Ident(word, start)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (multiCharPunct.contains(two)) { out += Punct(two, i); i += 2 }
        else if ("|,()[].=!<>+-*/$;:~{}%".indexOf(c) >= 0) { out += Punct(c.toString, i); i += 1 }
        else throw KqlParseException(s"unexpected character '$c'", i)
      }
    }
    out += Eof(n)
    out.result()
  }

  private val hyphenKeywords =
    Set("mv-expand", "project-rename", "project-away", "project-keep",
      "top-nested", "parse-where", "mv-apply", "top-hitters",
      "sample-distinct", "make-series", "project-reorder", "parse-kv",
      "granny-asc", "granny-desc", "make-graph", "graph-match",
      "graph-shortest-paths", "graph-to-table", "graph-mark-components")

  /** Escaped string literal — the reference's full escape set
    * (`lexer.rs:290-340`): simple escapes, octal (1-3 digits, byte-range),
    * and `\x`/`\u`/`\U` hex code points; malformed escapes fall back to the
    * literal characters, unknown ones keep the backslash.
    */
  private def lexString(src: String, start: Int, quote: Char): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    val n = src.length
    while (i < n && src.charAt(i) != quote) {
      val c = src.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val esc = src.charAt(i + 1)
        i += 2
        esc match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'a' => sb += '\u0007'; case 'b' => sb += '\b'
          case 'f' => sb += '\f'; case 'v' => sb += '\u000B'
          case c2 @ ('\\' | '"' | '\'') => sb += c2
          case 'x' | 'u' | 'U' =>
            val want = esc match { case 'x' => 2; case 'u' => 4; case _ => 8 }
            val hex = src.substring(i, math.min(n, i + want))
            val cp =
              if (hex.length == want && hex.forall(h => Character.digit(h, 16) >= 0))
                try {
                  val v = java.lang.Long.parseLong(hex, 16)
                  if (Character.isValidCodePoint(v.toInt) && v <= Int.MaxValue) Some(v.toInt)
                  else None
                } catch { case _: NumberFormatException => None }
              else None
            cp match {
              case Some(v) => sb.appendAll(Character.toChars(v)); i += want
              case None => sb += '\\'; sb += esc // malformed: keep literally
            }
          case d if d >= '0' && d <= '7' =>
            var oct = d.toString
            while (oct.length < 3 && i < n &&
                src.charAt(i) >= '0' && src.charAt(i) <= '7') {
              oct += src.charAt(i); i += 1
            }
            val v = Integer.parseInt(oct, 8)
            if (v <= 0xFF) sb += v.toChar
            else { sb += '\\'; sb ++= oct } // > byte range: keep literally
          // unknown escape (e.g. \d in a regex): keep the backslash
          case other => sb += '\\'; sb += other
        }
      } else { sb += c; i += 1 }
    }
    if (i >= n) throw KqlParseException("unterminated string", start)
    (sb.toString, i + 1)
  }

  /** Verbatim `@"…"` string: no escapes; the quote is escaped by doubling. */
  private def lexRawString(src: String, start: Int, quote: Char): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c == quote) {
        if (i + 1 < n && src.charAt(i + 1) == quote) { sb += quote; i += 2 }
        else return (sb.toString, i + 1)
      } else { sb += c; i += 1 }
    }
    throw KqlParseException("unterminated string", start)
  }

  /** Multiline string fenced by ``` or ~~~ — content is fully verbatim; a
    * missing closing fence takes the rest of the input (reference
    * `parse_multiline_*` behavior).
    */
  private def lexFenced(src: String, start: Int, fence: String): (String, Int) = {
    val from = start + fence.length
    val end = src.indexOf(fence, from)
    if (end < 0) (src.substring(from), src.length)
    else (src.substring(from, end), end + fence.length)
  }

  // bare datetime literals (`lexer.rs:207-215`, priority over numbers):
  // `2024-01-02`, `2024-01-02 03:04:05[.frac]`, and full ISO-8601 with
  // T + Z/offset; date-only and space-separated forms assume UTC
  private val isoDatetimeRe = java.util.regex.Pattern.compile(
    """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})""")
  private val plainDatetimeRe = java.util.regex.Pattern.compile(
    """(\d{4}-\d{2}-\d{2})(\s+(\d{2}:\d{2}:\d{2}(\.\d+)?))?""")

  private def lexDatetime(src: String, start: Int): Option[(Token, Int)] = {
    import java.time._
    def micros(inst: Instant): Long =
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    val iso = isoDatetimeRe.matcher(src)
    iso.region(start, src.length)
    if (iso.lookingAt()) {
      // out-of-range components fall through to number lexing, like the
      // reference's Option-returning callback
      try return Some((DatetimeTok(
        micros(OffsetDateTime.parse(src.substring(start, iso.end())).toInstant),
        start), iso.end()))
      catch { case _: Exception => () }
    }
    val plain = plainDatetimeRe.matcher(src)
    plain.region(start, src.length)
    if (plain.lookingAt()) {
      try {
        val inst =
          if (plain.group(3) == null)
            LocalDate.parse(plain.group(1)).atStartOfDay.toInstant(ZoneOffset.UTC)
          else
            LocalDateTime.parse(plain.group(1) + "T" + plain.group(3))
              .toInstant(ZoneOffset.UTC)
        return Some((DatetimeTok(micros(inst), start), plain.end()))
      } catch { case _: Exception => () }
    }
    None
  }

  /** Valid timespan suffixes (`lexer.rs:248` regex): short and long forms
    * of days/hours/minutes/seconds/millis/micros/nanos plus .NET ticks;
    * `us` kept as a convenience alias.
    */
  private val timespanSuffixes: Set[String] = {
    def forms(stem: String) =
      Set(stem, stem + "s", stem + "sec", stem + "second", stem + "seconds")
    Set("d", "day", "days", "h", "hr", "hrs", "hour", "hours",
      "m", "min", "mins", "minute", "minutes",
      "s", "sec", "secs", "second", "seconds",
      "ms", "tick", "ticks", "us") ++
      forms("milli") ++ forms("micro") ++ forms("nano")
  }

  /** Microseconds for `value` of the given suffix, with the reference's
    * truncation behavior (`lexer.rs:452-482`): nanos/micros/millis/ticks
    * truncate the numeric value first; seconds and larger keep the
    * fraction. Sub-microsecond remainders truncate (timespans are long
    * microseconds — SCALE.md deviation log).
    */
  private def timespanMicros(value: Double, suffix: String): Long =
    if (suffix.startsWith("nano")) value.toLong / 1000L
    else if (suffix.startsWith("micro") || suffix == "us") value.toLong
    else if (suffix.startsWith("milli") || suffix == "ms") value.toLong * 1000L
    else if (suffix.startsWith("tick")) (value * 100.0).toLong / 1000L
    else if (suffix.startsWith("s")) (value * 1e6).toLong
    else if (suffix.startsWith("m")) (value * 60e6).toLong
    else if (suffix.startsWith("h")) (value * 3600e6).toLong
    else (value * 86400e6).toLong // d
  /** Numbers: int (decimal or 0x hex), float (with `.` or exponent), or
    * timespan (suffix folded to microseconds; `m` is minutes per KQL).
    * Digits followed by a non-suffix word lex as one identifier, like the
    * reference's `[0-9]+[_a-zA-Z][_a-zA-Z0-9]*` ident rule.
    */
  private def lexNumber(src: String, start: Int): (Token, Int) = {
    var i = start
    val n = src.length
    // hex integer literal 0x1F (lexer.rs:244)
    if (src.charAt(start) == '0' && start + 1 < n &&
        (src.charAt(start + 1) == 'x' || src.charAt(start + 1) == 'X') &&
        start + 2 < n && Character.digit(src.charAt(start + 2), 16) >= 0) {
      i = start + 2
      while (i < n && Character.digit(src.charAt(i), 16) >= 0) i += 1
      return (IntTok(java.lang.Long.parseLong(src.substring(start + 2, i), 16), start), i)
    }
    while (i < n && src.charAt(i).isDigit) i += 1
    var isFloat = false
    // fractional part — but NOT the `..` range operator
    if (i < n && src.charAt(i) == '.' && i + 1 < n && src.charAt(i + 1).isDigit) {
      isFloat = true
      i += 1
      while (i < n && src.charAt(i).isDigit) i += 1
    }
    if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E') &&
        ((i + 1 < n && src.charAt(i + 1).isDigit) ||
          (i + 2 < n && (src.charAt(i + 1) == '-' || src.charAt(i + 1) == '+') &&
            src.charAt(i + 2).isDigit))) {
      isFloat = true
      i += 2
      while (i < n && src.charAt(i).isDigit) i += 1
    }
    val numText = src.substring(start, i)
    // timespan suffix?
    val sufStart = i
    while (i < n && src.charAt(i).isLetter) i += 1
    val suffix = src.substring(sufStart, i)
    // a char continuing the token after the letters (e.g. `1h30`) makes
    // the whole thing an identifier, per longest-match in the reference
    val continues = i < n && (src.charAt(i).isDigit || src.charAt(i) == '_')
    if (suffix.isEmpty) {
      if (isFloat) (FloatTok(numText.toDouble, start), sufStart)
      else (IntTok(numText.toLong, start), sufStart)
    } else if (timespanSuffixes(suffix) && !continues) {
      (TimespanTok(timespanMicros(numText.toDouble, suffix), start), i)
    } else if (!isFloat) {
      // digits + word = one identifier (e.g. `4xx_errors`), reference
      // ident rule; scan the full ident tail
      var j = i
      while (j < n && (src.charAt(j).isLetterOrDigit || src.charAt(j) == '_')) j += 1
      (Ident(src.substring(start, j), start), j)
    } else {
      throw KqlParseException(s"unknown numeric suffix '$suffix'", sufStart)
    }
  }
}
