package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-5 aggregation batch: percentiles() multi-expansion, take_any
  * (deterministic), binary_all_*, and the mergeable HLL sketch family
  * (hll / hll_merge aggregates + the dcount_hll estimator scalar).
  */
class AggExtSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq(
      ("a", 1L, 5L), ("a", 2L, 6L), ("a", 3L, 12L),
      ("b", 10L, 7L), ("b", 20L, 7L)
    ).toDF("k", "v", "m"))
    // two "daily rollup" slices of one logical table
    c.register("d1", Seq(("x", 1L), ("x", 2L), ("x", 3L)).toDF("k", "u"))
    c.register("d2", Seq(("x", 3L), ("x", 4L)).toDF("k", "u"))
    c
  }

  private def run(kql: String) = Kql.run(spark, cat, kql)

  test("percentiles expands to one column per p with Kusto naming") {
    val df = run("t | summarize percentiles(v, 0, 50, 100) by k | sort by k asc")
    assert(df.columns.toSeq ==
      Seq("k", "percentile_v_0", "percentile_v_50", "percentile_v_100"))
    val r = df.collect()
    assert(r(0).getDouble(1) == 1.0 && r(0).getDouble(3) == 3.0)
    assert(r(1).getDouble(2) == 10.0 || r(1).getDouble(2) == 20.0)
  }

  test("percentiles with an alias prefixes the p") {
    val df = run("t | summarize p = percentiles(v, 25, 75) by k")
    assert(df.columns.toSeq == Seq("k", "p_25", "p_75"))
  }

  test("take_any is the stable minimum; binary_all_* fold bits") {
    val df = run(
      """t | summarize a = take_any(v), ba = binary_all_and(m),
        |              bo = binary_all_or(m), bx = binary_all_xor(m)
        |     by k | sort by k asc""".stripMargin)
    val r = df.collect()
    // group a: m = 5,6,12 → and = 4, or = 15, xor = 5^6^12 = 11
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 4L &&
      r(0).getLong(3) == 15L && r(0).getLong(4) == (5L ^ 6L ^ 12L))
    assert(r(1).getLong(1) == 10L && r(1).getLong(2) == 7L &&
      r(1).getLong(3) == 7L && r(1).getLong(4) == 0L)
  }

  test("hll sketches estimate exactly at small cardinality") {
    val df = run(
      """t | summarize s = hll(v) by k
        | | project k, d = dcount_hll(s) | sort by k asc""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L)))
  }

  test("hll_merge unions stored sketches across rollup slices") {
    // per-slice sketches, then merged: u values {1,2,3} ∪ {3,4} = 4
    val df = run(
      """let s1 = (d1 | summarize s = hll(u) by k);
        |let s2 = (d2 | summarize s = hll(u) by k);
        |s1 | union (s2) | summarize m = hll_merge(s) by k
        | | project k, d = dcount_hll(m)""".stripMargin)
    assert(df.collect().head.getLong(1) == 4L)
  }

  test("hll on double/timestamp columns works via the string form") {
    val c2 = new Catalog(spark)
    c2.register("dd", Seq(("g", 1.5), ("g", 2.5), ("g", 1.5)).toDF("k", "x"))
    val df = Kql.run(spark, c2,
      "dd | summarize s = hll(x) by k | project k, d = dcount_hll(s)")
    assert(df.collect().head.getLong(1) == 2L)
  }

  test("take_any on a variant column preserves the value") {
    val c2 = new Catalog(spark)
    c2.register("vv", Seq(("g", """{"a":"str"}"""), ("g", """{"a":"str"}"""))
      .toDF("k", "js"))
    val df = Kql.run(spark, c2,
      """vv | extend d = todynamic(js)
        | | summarize a = take_any(d.a) by k
        | | project k, s = tostring(a)""".stripMargin)
    assert(df.collect().head.getString(1) == "str")
  }

  test("percentiles outside summarize is a clear error") {
    val e = intercept[KqlParseException](run(
      "t | evaluate pivot(k, percentiles(v, 50), 'a')"))
    assert(e.getMessage.contains("summarize-only"))
  }

  test("explain renders the new aggregates") {
    val txt = Kql.renderSteps(Kql.parse(
      "t | summarize a = take_any(v), b = binary_all_xor(m), h = hll(v), percentiles(v, 5, 95) by k"))
    assert(txt.contains("take_any(v)") && txt.contains("binary_all_xor(m)")
      && txt.contains("hll(v)"))
  }
}
