package graft.kql

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** activity_engagement / sliding_window_counts / rows_near semantics on a
  * hand-computable timeline (the gate rows carry the DuckDB oracles; these
  * pin the window edges and the serialized-input contract).
  */
class ActivityPluginSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  private lazy val cat = {
    val c = new Catalog(spark)
    // user 1 active days 1,2,3; user 2 active day 2; user 3 active day 4
    c.register("acts", Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(3)), (2L, ts(2)), (3L, ts(4)))
      .toDF("uid", "t"))
    c.register("rows", Seq(
      (1L, "a"), (2L, "x"), (3L, "a"), (4L, "a"), (5L, "a"), (6L, "a"),
      (7L, "x"), (8L, "a")).toDF("i", "v"))
    c
  }
  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("activity_engagement: inner=1d outer=2d window edges") {
    val r = run(
      """acts | evaluate activity_engagement(uid, t, 1d, 2d)
        | | project t, di = dcount_activities_inner,
        |     dd = dcount_activities_outer
        | | sort by t asc""".stripMargin).collect()
    // day1: inner {1} outer {1}; day2: inner {1,2} outer {1,2};
    // day3: inner {1} outer {1,2}; day4: inner {3} outer {1,3}
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (1L, 2L), (1L, 2L)))
  }

  test("sliding_window_counts: clipped to [start, end], counts rows") {
    val r = run(
      """acts | evaluate sliding_window_counts(uid, t,
        |     datetime(2024-01-02), datetime(2024-01-03), 2d, 1d)
        | | project t, c = Count, d = Dcount
        | | sort by t asc""".stripMargin).collect()
    // day2 window {d1,d2}: rows 3 (u1×2, u2), dcount 2
    // day3 window {d2,d3}: rows 3 (u1×2, u2), dcount 2
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ==
      Seq((3L, 2L), (3L, 2L)))
  }

  test("rows_near keeps context rows around matches, asymmetric") {
    val r = run(
      """rows | sort by i asc
        | | evaluate rows_near(v == 'x', 1, 2)
        | | project i | sort by i asc""".stripMargin).collect()
    // matches at 2 and 7: keep [1..4] and [6..8] (1 before, 2 after)
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L))
  }

  test("activity_counts_metrics: new vs returning ids, cumulative") {
    val r = run(
      """acts | evaluate activity_counts_metrics(uid, t,
        |     datetime(2024-01-01), datetime(2024-01-05), 1d)
        | | project t, c = count, d = dcount, nd = new_dcount,
        |     ad = aggregated_dcount
        | | sort by t asc""".stripMargin).collect()
    // d1: u1 (new); d2: u1,u2 (u2 new); d3: u1; d4: u3 (new)
    assert(r.map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
      x.getLong(4))).toSeq == Seq(
      (1L, 1L, 1L, 1L), (2L, 2L, 1L, 2L), (1L, 1L, 0L, 2L),
      (1L, 1L, 1L, 3L)))
  }

  test("activity_metrics: retention and churn against hand counts") {
    val r = run(
      """acts | evaluate activity_metrics(uid, t,
        |     datetime(2024-01-01), datetime(2024-01-05), 1d)
        | | project t, d = dcount_values, rr = retention_rate,
        |     cr = churn_rate
        | | sort by t asc""".stripMargin).collect()
    // d1 {1}; d2 {1,2}: retained {1}/1 → 1.0, churn 0.0
    // d3 {1}: retained {1}/2 → 0.5, churn 0.5
    // d4 {3}: retained 0/1 → 0.0, churn 1.0
    assert(r.map(x => (x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toSeq == Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (1L, 0.5, 0.5),
        (1L, 0.0, 1.0)))
  }

  test("new_activity_metrics: cohort retention matrix") {
    val r = run(
      """acts | evaluate new_activity_metrics(uid, t,
        |     datetime(2024-01-01), datetime(2024-01-05), 1d)
        | | project c = from_t, ts = t, d = dcount_values,
        |     cs = cohort_size, rr = retention_rate
        | | sort by c asc, ts asc""".stripMargin).collect()
    // cohort d1 = {1}: active d1,d2,d3 → (1,1,1.0) ×3
    // cohort d2 = {2}: active d2 → (1,1,1.0)
    // cohort d4 = {3}: active d4 → (1,1,1.0)
    assert(r.length == 5)
    assert(r.forall(x => x.getLong(2) == 1L && x.getLong(3) == 1L &&
      x.getDouble(4) == 1.0))
    // and cohort labels: 3 cells for d1's cohort
    assert(r.count(_.get(0).toString.startsWith("2024-01-01")) == 3)
  }

  test("session_count: sliding active-session count, (bin, lookback) order") {
    val r = run(
      """acts | evaluate session_count(uid, t,
        |     datetime(2024-01-02), datetime(2024-01-03), 1d, 2d)
        | | project t, s = count_sessions | sort by t asc""".stripMargin)
      .collect()
    // lookback 2d: d2 window {d1,d2} → {1,2}; d3 window {d2,d3} → {1,2}
    assert(r.map(_.getLong(1)).toSeq == Seq(2L, 2L))
  }

  test("rows_near requires a serialized input") {
    val e = intercept[KqlParseException] {
      run("rows | evaluate rows_near(v == 'x', 1)")
    }
    assert(e.getMessage.contains("serialized"))
  }
}
