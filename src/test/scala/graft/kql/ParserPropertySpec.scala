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

  test("every aggregation renders and round-trips (r10 MatchError guard)") {
    // the r10 review caught Render.agg missing the new TopK cases — a
    // /explain of any topk query threw scala.MatchError. Render + reparse
    // every aggregate form once so a future Aggregation case added to
    // Parser/Compiler/Ast but not Render fails here, not in production.
    val aggs = Seq(
      "count()", "countif(x > 1)", "dcount(x)", "dcount_approx(x)",
      "sum(x)", "avg(x)", "min(x)", "max(x)", "percentile(x, 95)",
      "make_list(x)", "make_set(x)", "make_list_if(x, x > 1)",
      "make_set_if(x, x > 1)", "make_list_with_nulls(x)", "stdev(x)",
      "variance(x)", "stdevp(x)", "variancep(x)", "covariance(x, y)",
      "covariancep(x, y)", "correlation(x, y)", "tdigest(x)",
      "merge_tdigest(x)", "topk_approx(x, 10)", "topk_accum(x)",
      "merge_topk(x)", "arg_max(x, y)", "arg_min(x, y)", "take_any(x)",
      "take_anyif(x, x > 1)", "binary_all_and(x)", "binary_all_or(x)",
      "binary_all_xor(x)", "hll(x)", "hll_merge(x)", "make_bag(x)",
      "sumif(x, x > 1)", "avgif(x, x > 1)", "minif(x, x > 1)",
      "maxif(x, x > 1)", "dcountif(x, x > 1)", "buildschema(x)")
    aggs.foreach { a =>
      val parsed = new Parser(s"t | summarize r = $a", 0L).parse()
      val agg = parsed.query.steps(1)
        .asInstanceOf[QueryStep.Summarize].aggs.head.agg
      val rendered = Render.agg(agg) // must not MatchError
      val reparsed = new Parser(s"t | summarize r = $rendered", 0L).parse()
        .query.steps(1).asInstanceOf[QueryStep.Summarize].aggs.head.agg
      assert(reparsed == agg, s"$a -> $rendered did not round-trip")
    }
  }
}
