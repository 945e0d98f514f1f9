package graft.kql

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the KQL front end: arbitrary input never crashes with
  * anything but a positioned KqlParseException, and rendered expressions
  * round-trip through the parser to the same AST (Render is the inverse of
  * Parser on the expression grammar).
  */
class ParserPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("lexer/parser never throw anything but KqlParseException") {
    check(Prop.forAll(Arbitrary.arbitrary[String]) { s =>
      try { Parser.parse(s); true }
      catch {
        case _: KqlParseException => true
        case _: Throwable => false
      }
    })
  }

  test("near-valid queries with random mutations fail cleanly") {
    val base = "events | where a > 1 and b contains 'x' | summarize n=count() by k=bin(t, 1h) | top 5 by n desc"
    val mutate = for {
      pos <- Gen.choose(0, base.length - 1)
      c <- Gen.oneOf('|', '(', ')', '=', '!', '.', ',', '\'', '[', '@', ' ')
    } yield base.updated(pos, c)
    check(Prop.forAll(mutate) { s =>
      try { Parser.parse(s); true }
      catch { case _: KqlParseException => true; case _: Throwable => false }
    })
  }

  // ───── expression round-trip: parse(render(e)) == e ─────

  private val genLeaf: Gen[Expr] = Gen.oneOf(
    Gen.choose(-1000L, 1000L).map(Expr.IntLit),
    Gen.choose(-100.0, 100.0).map(d => Expr.FloatLit(math.rint(d * 4) / 4)),
    Gen.oneOf(true, false).map(Expr.BoolLit),
    Gen.alphaNumStr.suchThat(_.length < 12).map(Expr.StrLit),
    Gen.identifier.suchThat(s => s.length < 10 && !Reserved(s.toLowerCase))
      .map(n => Expr.Field(FieldPath.simple(n))),
    Gen.oneOf(1L, 60L, 3600L, 86400L).map(s => Expr.TimespanLit(s * 1000000L)))

  private val Reserved = Set(
    "and", "or", "not", "in", "between", "contains", "startswith", "endswith",
    "has", "true", "false", "null", "by", "asc", "desc", "nulls", "on", "kind",
    "e") // bare 'e' would lex as part of float exponents in rendered output

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield Expr.And(l, r)),
      1 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield Expr.Or(l, r)),
      1 -> (for {
        op <- Gen.oneOf("==", "!=", ">", ">=", "<", "<=")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Expr.Cmp(op, l, r)),
      1 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Expr.Arith(op, l, r)),
      1 -> genExpr(depth - 1).map(Expr.Not),
      1 -> (for {
        c <- genExpr(depth - 1); t <- genLeaf; f <- genLeaf
      } yield Expr.Case(Seq((c, t)), f)))

  test("rendered expressions round-trip through the parser") {
    check(Prop.forAll(genExpr(3)) { e =>
      val text = Render.expr(e)
      val reparsed = new Parser(s"t | where $text", 0L).parse()
        .query.steps(1).asInstanceOf[QueryStep.Filter].e
      reparsed == e
    })
  }
}
