package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Function lets — `let f = (a: long) { a * 2 };` — scalar lambdas
  * expanded at parse time by re-parsing the body with params bound to the
  * call's argument expressions. Params shadow columns (innermost scope);
  * the compiled tree is ordinary Exprs, so pushdown/codegen are unchanged.
  */
class FuncLetSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      ("a", 1L, 10.0), ("b", 2L, 20.0), ("c", 3L, 30.0)
    ).toDF("k", "v", "x"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("basic expansion with column args") {
    val df = run(
      """let double = (a: long) { a * 2 };
        |t | extend d = double(v) | project k, d | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 4L), ("c", 6L)))
  }

  test("multi-param, nested calls, zero-arg") {
    val df = run(
      """let add = (a: long, b: long) { a + b };
        |let three = () { 3 };
        |t | extend s = add(add(v, 1), three()) | project k, s | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 5L), ("b", 6L), ("c", 7L)))
  }

  test("params shadow columns of the same name") {
    // param is named `v` — inside the body it must bind to the ARG (x),
    // not the column v
    val df = run(
      """let f = (v: real) { v + 0.5 };
        |t | extend r = f(x) | project k, r | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 10.5), ("b", 20.5), ("c", 30.5)))
  }

  test("function lets compose with scalar lets and other functions") {
    val df = run(
      """let base = 100;
        |let f = (a: long) { a + base };
        |let g = (a: long) { f(a) * 2 };
        |t | extend r = g(v) | project k, r | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 202L), ("b", 204L), ("c", 206L)))
  }

  test("works in filters and pushes down") {
    val df = run(
      """let big = (a: long) { a >= 2 };
        |t | where big(v) | project k | sort by k asc""".stripMargin)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("b", "c"))
  }

  test("argument expressions evaluate in the caller's scope") {
    val df = run(
      """let f = (a: long) { a * a };
        |t | extend r = f(v + 1) | project k, r | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 4L), ("b", 9L), ("c", 16L)))
  }

  test("arity mismatch fails with a clear message") {
    val e = intercept[KqlParseException](run(
      "let f = (a: long) { a }; t | extend r = f(v, v)"))
    assert(e.getMessage.contains("argument"))
  }

  test("recursion is rejected, not an infinite loop") {
    // declare-before-use scoping makes self/mutual recursion a parse
    // error at the declaration (the inner `f` is not yet bound) — the
    // funcDepth guard behind it is defense in depth
    intercept[KqlParseException](run(
      "let f = (a: long) { f(a) }; t | extend r = f(v)"))
  }

  test("an undeclared function is still an unknown-name error") {
    intercept[KqlParseException](run("t | extend r = nosuch(v)"))
  }
}
