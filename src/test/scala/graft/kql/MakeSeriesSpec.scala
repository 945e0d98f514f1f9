package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.sql.Timestamp

/** KQL `make-series` — fixed-step gap-filled series as arrays per group
  * (Kusto's series shape), lowered to two hash aggregations and a
  * map→array expansion: no joins, no per-group grid explode, no driver
  * collect for the derived-bounds case.
  */
class MakeSeriesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("ev", Seq(
      ("a", ts("2024-01-01 00:15:00"), 10.0),
      ("a", ts("2024-01-01 00:45:00"), 20.0),
      ("a", ts("2024-01-01 02:30:00"), 30.0), // hour 1 is a gap for a
      ("b", ts("2024-01-01 01:10:00"), 5.0),
      ("b", ts("2024-01-01 03:59:59"), 7.0)
    ).toDF("k", "t", "v"))
    c.register("num", Seq(("x", 1L, 2.0), ("x", 3L, 4.0), ("y", 7L, 1.0))
      .toDF("k", "n", "v"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("explicit bounds: gap-filled counts, end-exclusive range") {
    val df = run(
      """ev | make-series n = count() on t
        |      from datetime(2024-01-01 00:00:00) to datetime(2024-01-01 04:00:00)
        |      step 1h by k
        | | sort by k asc""".stripMargin)
    assert(df.columns.toSeq == Seq("k", "n", "t"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getSeq[Long](1) == Seq(2L, 0L, 1L, 0L))
    assert(rows(1).getSeq[Long](1) == Seq(0L, 1L, 0L, 1L))
    // axis: 4 bins anchored at from, end-exclusive
    val axis = rows(0).getSeq[Timestamp](2)
    assert(axis.size == 4)
    assert(axis.head == ts("2024-01-01 00:00:00"))
    assert(axis.last == ts("2024-01-01 03:00:00"))
  }

  test("default fills gaps with the declared literal; sum series") {
    val df = run(
      """ev | make-series s = sum(v) default = -1.0 on t
        |      from datetime(2024-01-01 00:00:00) to datetime(2024-01-01 03:00:00)
        |      step 1h by k
        | | sort by k asc""".stripMargin)
    val rows = df.collect()
    assert(rows(0).getSeq[Double](1) == Seq(30.0, -1.0, 30.0))
    assert(rows(1).getSeq[Double](1) == Seq(-1.0, 5.0, -1.0))
  }

  test("rows outside [from, to) are dropped") {
    val df = run(
      """ev | make-series n = count() on t
        |      from datetime(2024-01-01 01:00:00) to datetime(2024-01-01 02:00:00)
        |      step 30m by k
        | | sort by k asc""".stripMargin)
    val rows = df.collect()
    // only b's 01:10 event lands in range; a has NO in-range rows, so the
    // group itself disappears (Kusto: out-of-range rows never reach the agg)
    assert(rows.map(_.getString(0)).toSeq == Seq("b"))
    assert(rows(0).getSeq[Long](1) == Seq(1L, 0L))
  }

  test("derived bounds cover the global epoch-aligned min..max") {
    val df = run("ev | make-series n = count() on t step 1h by k | sort by k asc")
    val rows = df.collect()
    // global span 00:15 .. 03:59 → bins 00..03 (4 bins) for every group
    assert(rows(0).getSeq[Long](1) == Seq(2L, 0L, 1L, 0L))
    assert(rows(1).getSeq[Long](1) == Seq(0L, 1L, 0L, 1L))
    assert(rows(0).getSeq[Timestamp](2).head == ts("2024-01-01 00:00:00"))
  }

  test("no by clause: one global series row") {
    val df = run(
      """ev | make-series n = count(), s = sum(v) on t
        |      from datetime(2024-01-01 00:00:00) to datetime(2024-01-01 04:00:00)
        |      step 2h""".stripMargin)
    val r = df.collect().head
    assert(df.columns.toSeq == Seq("n", "s", "t"))
    assert(r.getSeq[Long](0) == Seq(3L, 2L))
    assert(r.getSeq[Double](1) == Seq(30.0 + 5.0, 37.0))
  }

  test("numeric axis") {
    val df = run(
      """num | make-series s = sum(v) on n from 0 to 8 step 2 by k
        | | sort by k asc""".stripMargin)
    val rows = df.collect()
    assert(rows(0).getString(0) == "x")
    assert(rows(0).getSeq[Double](1) == Seq(2.0, 4.0, 0.0, 0.0))
    assert(rows(1).getSeq[Double](1) == Seq(0.0, 0.0, 0.0, 1.0))
    assert(rows(0).getSeq[Double](2) == Seq(0.0, 2.0, 4.0, 6.0))
  }

  test("non-literal step / half-open bounds are rejected") {
    assert(intercept[KqlParseException](
      run("ev | make-series n = count() on t step v")).getMessage
      .contains("literal"))
    assert(intercept[KqlParseException](
      run("ev | make-series n = count() on t from datetime(2024-01-01) step 1h"))
      .getMessage.toLowerCase.contains("to"))
  }

  test("empty input yields an empty result, grouped or not") {
    assert(run(
      """ev | where k == 'nope' | make-series n = count() on t
        |      from datetime(2024-01-01) to datetime(2024-01-02) step 1h""".stripMargin)
      .count() == 0)
    assert(run(
      "ev | where k == 'nope' | make-series n = count() on t step 1h by k")
      .count() == 0)
  }

  test("dynamic group keys are rejected with guidance") {
    val c2 = new Catalog(spark)
    c2.register("j", Seq(("""{"a":1}""", ts("2024-01-01 00:00:00")))
      .toDF("js", "t"))
    val e = intercept[KqlParseException](Kql.run(spark, c2,
      "j | extend d = todynamic(js) | make-series n = count() on t step 1h by d"))
    assert(e.getMessage.contains("tostring"))
  }

  test("plan: two hash aggregations, no join, no SinglePartition") {
    val df = run(
      """ev | make-series n = count() on t
        |      from datetime(2024-01-01 00:00:00) to datetime(2024-01-01 04:00:00)
        |      step 1h by k""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("explain renders make-series") {
    val txt = Kql.renderSteps(Parser.parse(
      "ev | make-series n = count() on t step 1h by k"))
    assert(txt.contains("make-series n = count() default = 0 on t step"))
  }
}
