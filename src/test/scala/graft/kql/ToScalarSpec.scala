package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** toscalar(subquery) — first column of the first row, evaluated eagerly
  * at compile (Kusto semantics), memoized per subquery per compilation.
  */
class ToScalarSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      ("a", 1L), ("b", 5L), ("c", 9L), ("d", 12L)
    ).toDF("k", "v"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("filters against an aggregate of another (or the same) table") {
    val df = run(
      """t | where v > toscalar(t | summarize m = max(v)) / 2
        | | sort by k asc | project k""".stripMargin)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("c", "d"))
  }

  test("usable in extend and via scalar lets; type follows the value") {
    val df = run(
      """let thr = toscalar(t | summarize c = count());
        |t | extend n = thr, frac = v * 1.0 / thr | where k == 'b'
        | | project n, frac""".stripMargin)
    val r = df.collect().head
    assert(r.getLong(0) == 4L && r.getDouble(1) == 1.25)
  }

  test("string and empty results") {
    val df = run(
      """t | where k == toscalar(t | sort by v desc | project k | take 1)
        | | project v""".stripMargin)
    assert(df.collect().head.getLong(0) == 12L)
    // empty subquery → null → comparison drops every row
    assert(run(
      "t | where v == toscalar(t | where v > 100 | project v | take 1) | count")
      .collect().head.getLong(0) == 0L)
  }

  test("explain renders a placeholder and still evaluates eagerly") {
    val txt = Kql.explain(spark, cat,
      "t | where v > toscalar(t | summarize m = max(v)) - 1")
    assert(txt.contains("toscalar(<subquery>)"))
    // eager evaluation at explain: the subquery value became a literal,
    // so the optimizer could fold the whole local-relation query away
    assert(txt.contains("optimized plan"))
  }
}
