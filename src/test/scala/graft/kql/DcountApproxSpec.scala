package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The HLL++ fast mode of dcount: close to exact on real cardinalities,
  * same null-counts-as-one-distinct semantics, same default naming shape.
  */
class DcountApproxSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("events", Tables.load(spark, TestSpark.sf, "events"))
    c
  }

  test("dcount_approx tracks exact dcount within HLL tolerance") {
    val exact = Kql.run(spark, cat,
      "events | summarize d=dcount(user_id) by event_type | sort by event_type asc")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val approx = Kql.run(spark, cat,
      "events | summarize d=dcount_approx(user_id) by event_type | sort by event_type asc")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      // approx_count_distinct default rsd = 5%; allow 3 sigma plus slack
      // for tiny groups
      assert(math.abs(ap - ex) <= math.max(3, 0.15 * ex),
        s"group $k: exact $ex vs approx $ap")
    }
  }

  test("dcount_approx counts an explicit null as one distinct value") {
    import spark.implicits._
    val c = new Catalog(spark)
    c.register("t", Seq[(java.lang.Long, String)](
      (1L, "g"), (1L, "g"), (null, "g"), (null, "g"), (2L, "g"))
      .toDF("x", "g"))
    val got = Kql.run(spark, c, "t | summarize d=dcount_approx(x) by g")
      .collect().head.getLong(1)
    assert(got == 3L) // {1, 2} + the null bucket, per the reference's dcount
  }

  test("default output name follows the dcount_<field> convention") {
    val df = Kql.run(spark, cat,
      "events | summarize dcount_approx(user_id)")
    assert(df.columns.contains("dcount_approx_user_id"))
  }

  test("percentile() lands at the right RANK (the sketch's contract)") {
    // a quantile sketch returns an actual data value near rank p·n — the
    // right check is rank accuracy, not distance to the interpolated
    // exact quantile (which can sit far away inside a sparse tail gap)
    val approx = Kql.run(spark, cat,
      "events | summarize p=percentile(value, 50), hi=percentile(value, 99) by event_type | sort by event_type asc")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, TestSpark.sf, "events")
    assert(approx.nonEmpty)
    approx.foreach { case (g, p50, p99) =>
      val grp = ev.filter(col("event_type") === g)
      val n = grp.count().toDouble
      def rankOf(v: Double): Double =
        grp.filter(col("value") <= v).count() / n
      assert(math.abs(rankOf(p50) - 0.50) <= 0.02, s"$g p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p99) - 0.99) <= 0.02, s"$g p99 rank ${rankOf(p99)}")
    }
  }

  test("percentile default name and render round-trip") {
    val df = Kql.run(spark, cat, "events | summarize percentile(value, 95)")
    assert(df.columns.contains("percentile_value_95"))
    assert(Render.agg(Aggregation.Percentile(
      FieldPath(Seq(FieldAccess("value"))), 95.0)) == "percentile(value, 95)")
  }

  test("percentile p outside [0, 100] is a parse error") {
    val e = intercept[KqlParseException] {
      Kql.run(spark, cat, "events | summarize percentile(value, 101)")
    }
    assert(e.getMessage.contains("[0, 100]"))
  }

  test("dcount_intersect: exact-mode sketches give exact intersections") {
    import spark.implicits._
    val c2 = new Catalog(spark)
    // A = {1..10}, B = {6..15}, C = {8..12}: |A|=10, |A∩B|=5, |A∩B∩C|=3
    c2.register("t", (Seq.tabulate(10)(i => (i + 1, "a")) ++
      Seq.tabulate(10)(i => (i + 6, "b")) ++
      Seq.tabulate(5)(i => (i + 8, "c"))).toDF("v", "g"))
    val r = Kql.run(spark, c2,
      """let a = (t | where g == 'a' | summarize h1 = hll(v) | extend k = 1);
        |let b = (t | where g == 'b' | summarize h2 = hll(v) | extend k = 1);
        |let c = (t | where g == 'c' | summarize h3 = hll(v) | extend k = 1);
        |a | join kind=inner (b) on k | join kind=inner (c) on k
        | | evaluate dcount_intersect(h1, h2, h3)""".stripMargin).collect()
    val row = r.head
    val si = (0 to 2).map(i => row.getLong(row.fieldIndex(s"s$i")))
    assert(si == Seq(10L, 5L, 3L))
  }

  test("scalar hll_merge unions sketch values") {
    import spark.implicits._
    val c2 = new Catalog(spark)
    c2.register("t", (1 to 10).map(i => (i, if (i <= 6) "a" else "b"))
      .toDF("v", "g"))
    val r = Kql.run(spark, c2,
      """let a = (t | where g == 'a' | summarize h1 = hll(v) | extend k = 1);
        |let b = (t | where g == 'b' | summarize h2 = hll(v) | extend k = 1);
        |a | join kind=inner (b) on k
        | | project d = dcount_hll(hll_merge(h1, h2))""".stripMargin)
      .collect()
    assert(r.head.getLong(0) == 10L)
  }
}
