package graft.kql

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** funnel_sequence: counts + prev/next state tables, restructured to
  * stacked rows (the fork/facet precedent).
  */
class FunnelSequenceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("ev", Seq(
      (1L, ts(0), "a"), (1L, ts(5), "view"), (1L, ts(10), "purchase"),
      (1L, ts(20), "z"),
      (2L, ts(0), "view"), (2L, ts(20), "purchase"),
      (3L, ts(0), "purchase"),
      (4L, ts(0), "view"), (4L, ts(59), "purchase") // beyond 30m window
    ).toDF("uid", "t", "st"))
    c
  }
  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("counts, prev and next states on a hand-computable funnel") {
    val r = run(
      """ev | evaluate funnel_sequence(uid, t,
        |     datetime(2024-01-01), datetime(2024-01-02), 30m, 1d, st,
        |     'view', 'purchase')
        | | sort by kind asc, state asc nulls first""".stripMargin)
      .collect()
    val rows = r.map(x => (x.getString(0),
      Option(x.get(1)).map(_.toString).getOrElse(""),
      if (x.isNullAt(2)) "" else x.getString(2), x.getLong(3))).toSeq
    // u1 and u2 match (u3 no view, u4 beyond window); u1's prev is 'a',
    // next is 'z'; u2 has no prev/next events
    assert(rows == Seq(
      ("count", "2024-01-01 00:00:00.0", "", 2L),
      ("next", "", "z", 1L),
      ("prev", "", "a", 1L)))
  }

  test("earliest match per id defines prev/next") {
    val c2 = new Catalog(spark)
    c2.register("ev2", Seq(
      (1L, ts(0), "first"), (1L, ts(1), "view"), (1L, ts(2), "purchase"),
      (1L, ts(30), "mid"), (1L, ts(31), "view"), (1L, ts(32), "purchase"))
      .toDF("uid", "t", "st"))
    val r = Kql.run(spark, c2,
      """ev2 | evaluate funnel_sequence(uid, t,
        |     datetime(2024-01-01), datetime(2024-01-02), 10m, 1d, st,
        |     'view', 'purchase')
        | | where kind == 'prev' | project state""".stripMargin).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("first"))
  }
}
