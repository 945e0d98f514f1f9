package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `top-nested` (hierarchical top-k) and the `range` generated source. */
class TopNestedSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    // categories with known counts: a=4, b=3, c=2, d=1
    c.register("t", Seq(
      ("a", "x", 10.0), ("a", "x", 1.0), ("a", "y", 5.0), ("a", "z", 2.0),
      ("b", "x", 7.0), ("b", "y", 3.0), ("b", "y", 4.0),
      ("c", "z", 8.0), ("c", "z", 9.0),
      ("d", "x", 6.0)
    ).toDF("k", "sub", "v"))
    c
  }

  test("single-level top-nested keeps the top n groups by the aggregate") {
    val rows = Kql.run(spark, cat,
      "t | top-nested 2 of k by n = count() | sort by k asc").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 4L), ("b", 3L)))
  }

  test("ties break by the smaller key (total rule)") {
    val c2 = new Catalog(spark)
    c2.register("u", Seq("p", "q", "r", "p", "q", "r").toDF("k"))
    val rows = Kql.run(spark, c2,
      "u | top-nested 2 of k by n = count() | sort by k asc").collect()
    // all counts tie at 2 → the two smallest keys win
    assert(rows.map(_.getString(0)).toSeq == Seq("p", "q"))
  }

  test("two-level top-nested: inner top-k is per surviving outer key") {
    val rows = Kql.run(spark, cat,
      """t | top-nested 2 of k by n1 = count(), top-nested 1 of sub by s = sum(v)
        |  | sort by k asc""".stripMargin).collect()
    // k=a: subs x=11, y=5, z=2 → x; k=b: x=7, y=7 → tie → larger-agg
    // first then smaller key: x and y tie at 7 → x wins
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getDouble(3))).toSeq ==
      Seq(("a", 4L, "x", 11.0), ("b", 3L, "x", 7.0)))
  }

  test("output column order is k1, agg1, k2, agg2") {
    val df = Kql.run(spark, cat,
      "t | top-nested 1 of k by n1 = count(), top-nested 1 of sub by n2 = count()")
    assert(df.columns.toSeq == Seq("k", "n1", "sub", "n2"))
  }

  test("range generates an inclusive int grid") {
    val rows = Kql.run(spark, cat,
      "range x from 1 to 10 step 3 | sort by x asc").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 4L, 7L, 10L))
  }

  test("range over datetimes with a timespan step") {
    val rows = Kql.run(spark, cat,
      """range h from datetime(2024-01-01) to datetime(2024-01-01 06:00:00) step 2h
        | | sort by h asc""".stripMargin).collect()
    assert(rows.map(_.getTimestamp(0).toInstant.toString).toSeq == Seq(
      "2024-01-01T00:00:00Z", "2024-01-01T02:00:00Z",
      "2024-01-01T04:00:00Z", "2024-01-01T06:00:00Z"))
  }

  test("a table actually named range still scans") {
    val c2 = new Catalog(spark)
    c2.register("range", Seq(1L, 2L).toDF("id"))
    assert(Kql.run(spark, c2, "range | count").collect().head.getLong(0) == 2L)
  }

  test("range feeding a join: calendar spine left-joins sparse data") {
    val df = Kql.run(spark, cat,
      """range x from 1 to 5 step 1
        | | join kind=left (t | summarize n = count() by v | project v, n)
        |     on $left.x == $right.v
        | | sort by x asc""".stripMargin)
    assert(df.count() == 5)
  }

  test("with others: excluded keys bucket under the label, exact count") {
    val rows = Kql.run(spark, cat,
      """t | top-nested 2 of k with others = 'REST' by n = count()
        | | sort by k asc""".stripMargin).collect()
    // top-2: a=4, b=3; others bucket = c(2) + d(1) = 3 rows
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("REST", 3L), ("a", 4L), ("b", 3L)))
  }

  test("with others: deeper levels nest inside the bucket; dcount exact") {
    val rows = Kql.run(spark, cat,
      """t | top-nested 1 of k with others = 'REST' by n = count(),
        |     top-nested 1 of sub by d = dcount(v)
        | | sort by k asc, sub asc""".stripMargin).collect()
    val m = rows.map(r => ((r.getString(0), r.getString(2)),
      (r.getLong(1), r.getLong(3)))).toMap
    // top-1 outer = a (4 rows); REST = b+c+d (6 rows). Inside REST the
    // top sub by distinct v: b has y{3,4} x{7}, c has z{8,9}, d x{6} →
    // sub y d=2, z d=2, x d=2 — tie breaks to the smaller key 'x'...
    // dcount over REST's x = {7, 6} = 2
    assert(m.contains(("a", "x")) && m(("a", "x")) == (4L, 2L))
    assert(rows.exists(r => r.getString(0) == "REST" && r.getLong(3) == 2L))
  }

  test("with others on a numeric key widens the key column to string") {
    val c2 = new Catalog(spark)
    c2.register("nums", Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k"))
    val rows = Kql.run(spark, c2,
      """nums | top-nested 1 of k with others = 'rest' by n = count()
        | | sort by k asc""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("1", 3L), ("rest", 3L)))
  }
}
