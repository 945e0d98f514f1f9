package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `mv-apply` — the per-row array subquery. */
class MvApplySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      (1L, Seq(1L, 5L, 3L, 5L)),
      (2L, Seq(10L)),
      (3L, Seq.empty[Long])
    ).toDF("id", "xs"))
    c
  }

  test("multi-column mv-apply zips arrays, pads the shorter with null") {
    val c2 = new Catalog(spark)
    c2.register("z", Seq(
      (1L, Seq(1L, 2L, 3L), Seq("p", "q")),
      (2L, Seq.empty[Long], Seq.empty[String])
    ).toDF("id", "xs", "ys"))
    val rows = Kql.run(spark, c2,
      """z | mv-apply a = xs, b = ys on (where a > 1)
        |  | project id, a, b | sort by a asc""".stripMargin).collect()
    // zip: (1,p),(2,q),(3,null); a>1 keeps (2,q),(3,null); id=2 empty → gone
    assert(rows.map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .toSeq == Seq((1L, 2L, Some("q")), (1L, 3L, None)))
    val agg = Kql.run(spark, c2,
      """z | mv-apply a = xs, b = ys on (summarize s = sum(a), n = count())
        |  | project id, s, n""".stripMargin).collect()
    assert(agg.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((1L, 6.0, 3L)))
  }

  test("where + summarize aggregates per source row") {
    val rows = Kql.run(spark, cat,
      """t | mv-apply x = xs on (where x >= 3 | summarize n = count(), s = sum(x), d = dcount(x))
        |  | sort by id asc""".stripMargin).collect()
    // id=1: elements {5,3,5} → n=3, s=13, d=2; id=2: {10}; id=3: empty → gone
    assert(rows.map(r => (r.getLong(0), r.getLong(2), r.getDouble(3),
      r.getLong(4))).toSeq ==
      Seq((1L, 3L, 13.0, 2L), (2L, 1L, 10.0, 1L)))
  }

  test("sort + take keeps the per-row top-k elements") {
    val rows = Kql.run(spark, cat,
      """t | mv-apply x = xs on (sort by x desc | take 2)
        |  | project id, x | sort by id asc, x desc""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5L), (1L, 5L), (2L, 10L)))
  }

  test("extend derives per-element columns; element rows keep originals") {
    val rows = Kql.run(spark, cat,
      """t | mv-apply x = xs on (extend y = x * 10 | where y > 30)
        |  | project id, x, y | sort by id asc, x asc""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 5L), (1L, 5L), (2L, 10L)).map(t => (t._1, t._2, t._2 * 10)))
  }

  test("bare form replaces the array column with the element") {
    val df = Kql.run(spark, cat, "t | mv-apply xs on (where xs > 3)")
    assert(df.columns.toSeq == Seq("id", "xs"))
    assert(df.count() == 3) // 5, 5, 10
  }

  test("unsupported inner steps are rejected with a clear error") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "t | mv-apply x = xs on (distinct x)")
    }
    assert(e.getMessage.contains("mv-apply supports"))
  }
}
