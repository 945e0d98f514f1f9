package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Tabular function lets + `invoke` — the body pipeline splices at the
  * call site with scalar params substituted; the compiler sees ordinary
  * steps, so pushdown and the serialize bookkeeping flow through.
  */
class InvokeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      ("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)
    ).toDF("k", "v"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("basic invoke with a scalar arg") {
    val df = run(
      """let big = (T: table, thresh: long) { T | where v > thresh };
        |t | invoke big(2) | sort by k asc""".stripMargin)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("c", "d"))
  }

  test("multi-step body; steps compose before and after invoke") {
    val df = run(
      """let prep = (T: table, m: long) {
        |  T | where v >= m | extend vv = v * v
        |};
        |t | where k != 'd' | invoke prep(2) | project k, vv | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 4L), ("c", 9L)))
  }

  test("zero scalar params; aggregating body") {
    val df = run(
      """let total = (T: table) { T | summarize s = sum(v) };
        |t | invoke total()""".stripMargin)
    assert(df.collect().head.getDouble(0) == 10.0)
  }

  test("serialize state flows through an order-preserving body") {
    val df = run(
      """let keep = (T: table) { T | where v > 0 };
        |t | sort by v asc | invoke keep() | extend rk = row_number()
        | | project k, rk""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
  }

  test("tabular functions can call scalar function lets") {
    val df = run(
      """let sq = (a: long) { a * a };
        |let f = (T: table, m: long) { T | extend s = sq(v) | where s >= m };
        |t | invoke f(9) | project k, s | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("c", 9L), ("d", 16L)))
  }

  test("declaration and call-site errors") {
    // body must start from the table param
    val e = intercept[KqlParseException](run(
      "let f = (T: table) { t | count }; t | invoke f()"))
    assert(e.getMessage.contains("table parameter"))
    // arity
    val e2 = intercept[KqlParseException](run(
      "let f = (T: table, x: long) { T | where v > x }; t | invoke f()"))
    assert(e2.getMessage.contains("argument"))
    // unknown function
    val e3 = intercept[KqlParseException](run("t | invoke nosuch()"))
    assert(e3.getMessage.contains("unknown tabular function"))
    // table param must be first
    intercept[KqlParseException](run(
      "let f = (x: long, T: table) { T | where v > x }; t | invoke f(1)"))
  }

  test("explain renders the spliced body") {
    val txt = Kql.renderSteps(Kql.parse(
      "let f = (T: table, x: long) { T | where v > x }; t | invoke f(5)"))
    assert(txt.contains("invoke f ("))
    assert(txt.contains("where v > 5"))
  }
}
