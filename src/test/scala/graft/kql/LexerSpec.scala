package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import Token._

/** Ports of the reference lexer tests (`miso-kql/src/lexer_tests.rs`):
  * escape sequences, verbatim and multiline strings, scientific/hex
  * numbers, extended timespan suffixes, and byte-string rejection.
  */
class LexerSpec extends AnyFunSuite {

  private def one(src: String): Token = {
    val toks = Lexer.lex(src)
    assert(toks.length == 2, s"expected one token + EOF, got $toks")
    toks.head
  }

  private def str(src: String): String = one(src).asInstanceOf[StrTok].v

  test("basic and quote escapes") {
    assert(str(""""Hello\nWorld"""") == "Hello\nWorld")
    assert(str(""""Tab\there"""") == "Tab\there")
    assert(str(""""Quote: \"Hello\""""") == """Quote: "Hello"""")
    assert(str(""""Backslash: \\"""") == """Backslash: \""")
    assert(str("\"\\a\\b\\f\\v\"") == "\u0007\b\f\u000B")
  }

  test("hex and unicode escapes, with too-short/non-hex fallbacks") {
    assert(str("\"\\x41\"") == "A")
    assert(str("\"\\x7A\"") == "z")
    assert(str("\"\\x4\"") == "\\x4")
    assert(str("\"\\xGG\"") == "\\xGG")
    assert(str("\"\\u0041\"") == "A")
    assert(str("\"\\U00000041\"") == "A")
    assert(str("\"\\u263A\"") == "\u263A")
    assert(str("\"\\u41\"") == "\\u41")
    assert(str("\"\\U0041\"") == "\\U0041")
  }

  test("octal escapes: 1-3 digits, invalid and trailing forms") {
    assert(str("\"\\7\"") == "\u0007")
    assert(str("\"\\77\"") == "?")
    assert(str("\"\\101\"") == "A")
    assert(str("\"\\8\"") == "\\8")
    assert(str("\"\\78\"") == "\u0007" + "8")
    assert(str("\"\\q\"") == "\\q")
  }

  test("verbatim strings skip escape processing; doubled quote escapes") {
    assert(str("""@"hello world"""") == "hello world")
    assert(str("@'hello world'") == "hello world")
    assert(str("""@"hello\nworld"""") == """hello\nworld""")
    assert(str("""@"say ""hi"" now"""") == """say "hi" now""")
  }

  test("multiline fenced strings, including missing end fence") {
    assert(str("```hello\nworld```") == "hello\nworld")
    assert(str("~~~hello\nworld~~~") == "hello\nworld")
    assert(str("``````") == "")
    assert(str("~~~~~~") == "")
    assert(str("```unfinished") == "unfinished")
    assert(str("~~~incomplete") == "incomplete")
  }

  test("byte strings are rejected with the reference's guidance") {
    for (src <- Seq("""h"hello"""", """H"x"""", "h'test'", """h@"raw""""))
      assert(intercept[KqlParseException](Lexer.lex(src))
        .getMessage.contains("byte strings are currently not supported"))
  }

  test("scientific floats incl. positive exponents") {
    assert(one("123e4").asInstanceOf[FloatTok].v == 123e4)
    assert(one("456E10").asInstanceOf[FloatTok].v == 456e10)
    assert(one("789e-3").asInstanceOf[FloatTok].v == 789e-3)
    assert(one("42E+5").asInstanceOf[FloatTok].v == 42e5)
    assert(one("99.99e+2").asInstanceOf[FloatTok].v == 99.99e2)
    assert(one("0e0").asInstanceOf[FloatTok].v == 0.0)
  }

  test("hex integer literals") {
    assert(one("0x1A").asInstanceOf[IntTok].v == 0x1AL)
    assert(one("0X2B").asInstanceOf[IntTok].v == 0x2BL)
    assert(one("0xDEADBEEF").asInstanceOf[IntTok].v == 0xDEADBEEFL)
    assert(one("0xfF").asInstanceOf[IntTok].v == 0xFFL)
    assert(one("0x0").asInstanceOf[IntTok].v == 0L)
  }

  test("extended timespan suffixes with reference truncation") {
    assert(one("2days").asInstanceOf[TimespanTok].micros == 2L * 86400000000L)
    assert(one("3hours").asInstanceOf[TimespanTok].micros == 3L * 3600000000L)
    assert(one("90minutes").asInstanceOf[TimespanTok].micros == 90L * 60000000L)
    assert(one("30seconds").asInstanceOf[TimespanTok].micros == 30000000L)
    assert(one("1.5h").asInstanceOf[TimespanTok].micros == 5400000000L)
    assert(one("1.5s").asInstanceOf[TimespanTok].micros == 1500000L)
    // millis/micros/nanos/ticks truncate the value first (lexer.rs:467-473)
    assert(one("1.9ms").asInstanceOf[TimespanTok].micros == 1000L)
    assert(one("1500micros").asInstanceOf[TimespanTok].micros == 1500L)
    assert(one("2500nanos").asInstanceOf[TimespanTok].micros == 2L)
    assert(one("15ticks").asInstanceOf[TimespanTok].micros == 1L) // 1500ns
  }

  test("digits followed by a word lex as one identifier") {
    assert(one("4xx_errors") == Ident("4xx_errors", 0))
    assert(one("2abc") == Ident("2abc", 0))
    assert(one("1h30") == Ident("1h30", 0)) // longest match, like the reference
    val mixed = Lexer.lex("where 5xx > 3")
    assert(mixed(1) == Ident("5xx", 6))
  }

  test("bare datetime literals lex with reference formats and UTC") {
    // 2024-01-02 00:00:00 UTC = 1704153600 s
    assert(one("2024-01-02") == DatetimeTok(1704153600000000L, 0))
    assert(one("2024-01-02 03:04:05") ==
      DatetimeTok(1704164645000000L, 0))
    assert(one("2024-01-02 03:04:05.5") ==
      DatetimeTok(1704164645500000L, 0))
    assert(one("2024-01-02T03:04:05Z") ==
      DatetimeTok(1704164645000000L, 0))
    assert(one("2024-01-02T03:04:05+01:00") ==
      DatetimeTok(1704164645000000L - 3600000000L, 0))
    // out-of-range components fall back to arithmetic over integers
    val toks = Lexer.lex("9999-99-99")
    assert(toks.head == IntTok(9999, 0))
  }

  test("bare datetimes work in comparisons end-to-end") {
    val q = Parser.parse("t | where ts >= 2024-01-02 and ts < 2024-02-01")
    assert(q.query.steps.length == 2)
  }

  test("capitalized booleans parse as literals") {
    val q = Parser.parse("t | where a == True | where b == FALSE")
    assert(q.query.steps.length == 3)
  }
}
