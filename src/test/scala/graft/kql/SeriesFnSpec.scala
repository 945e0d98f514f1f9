package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `series_*` scalar family — elementwise arithmetic, reducers, and the
  * FIR filter over make-series-style arrays. All pure codegen'd array
  * lambdas (zip_with/transform/aggregate), no UDFs.
  */
class SeriesFnSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, "x")).toDF("id", "k"))
    c
  }

  private def one(expr: String): org.apache.spark.sql.Row =
    Kql.run(spark, cat,
      s"t | extend a = pack_array(1, 2, 3, 4), b = pack_array(10, 20, 30, 40) | project r = $expr")
      .collect().head

  test("elementwise add/subtract/multiply keep integer types") {
    assert(one("series_add(a, b)").getSeq[Long](0) == Seq(11L, 22L, 33L, 44L))
    assert(one("series_subtract(b, a)").getSeq[Long](0) == Seq(9L, 18L, 27L, 36L))
    assert(one("series_multiply(a, a)").getSeq[Long](0) == Seq(1L, 4L, 9L, 16L))
  }

  test("divide is double; abs; mismatched lengths pad with null") {
    assert(one("series_divide(b, a)").getSeq[Double](0) ==
      Seq(10.0, 10.0, 10.0, 10.0))
    assert(one("series_abs(series_subtract(a, b))").getSeq[Long](0) ==
      Seq(9L, 18L, 27L, 36L))
    val r = Kql.run(spark, cat,
      "t | extend a = pack_array(1, 2), b = pack_array(10) | project r = series_add(a, b)")
      .collect().head.getSeq[Any](0)
    assert(r == Seq(11L, null))
  }

  test("reducers: sum/avg double, min/max keep type") {
    assert(one("series_sum(a)").getDouble(0) == 10.0)
    assert(one("series_avg(a)").getDouble(0) == 2.5)
    assert(one("series_min(a)").getLong(0) == 1L)
    assert(one("series_max(b)").getLong(0) == 40L)
  }

  test("series_fir: trailing window, partial at the head") {
    // weights (1,1,1), x = (1,2,3,4): y = 1, 3, 6, 9 (partial head sums)
    assert(one("series_fir(a, pack_array(1, 1, 1))").getSeq[Double](0) ==
      Seq(1.0, 3.0, 6.0, 9.0))
    // weighted: w=(2,1) → y[i] = 2x[i] + x[i-1]
    assert(one("series_fir(a, pack_array(2, 1))").getSeq[Double](0) ==
      Seq(2.0, 5.0, 8.0, 11.0))
  }

  test("series_fir normalize divides by the weights actually used") {
    // moving average of available points: 1, 1.5, 2, 3
    assert(one("series_fir(a, pack_array(1, 1, 1), true)").getSeq[Double](0) ==
      Seq(1.0, 1.5, 2.0, 3.0))
  }

  test("composes with make-series output") {
    val c2 = new Catalog(spark)
    c2.register("ev", Seq(
      ("g", 0L), ("g", 0L), ("g", 2L), ("g", 3L), ("g", 3L), ("g", 3L)
    ).toDF("k", "n"))
    val df = Kql.run(spark, c2,
      """ev | make-series c = count() on n from 0 to 4 step 1 by k
        | | extend sm = series_fir(c, pack_array(1, 1), true),
        |          tot = series_sum(c)
        | | project k, sm, tot""".stripMargin)
    val r = df.collect().head
    // counts per bin: 2,0,1,3 → pairwise avg: 2, 1, 0.5, 2
    assert(r.getSeq[Double](1) == Seq(2.0, 1.0, 0.5, 2.0))
    assert(r.getDouble(2) == 6.0)
  }

  test("series_fir with empty weights is null, not a crash") {
    val r = Kql.run(spark, cat,
      """t | extend a = pack_array(1, 2), w = array_slice(pack_array(1), 5, 6)
        | | project r = series_fir(a, w)""".stripMargin).collect().head
    assert(r.isNullAt(0))
  }

  test("series_avg of an empty series is null, not NaN") {
    val r = Kql.run(spark, cat,
      "t | extend a = array_slice(pack_array(1, 2), 5, 6) | project r = series_avg(a)")
      .collect().head
    assert(r.isNullAt(0))
  }

  test("series_stats_dynamic bag fields") {
    val r = Kql.run(spark, cat,
      """t | extend a = pack_array(4, 1, 7, 1)
        | | extend st = series_stats_dynamic(a)
        | | project mn = toreal(st.min), mni = tolong(st.min_idx),
        |           mx = toreal(st.max), mxi = tolong(st.max_idx),
        |           av = toreal(st.avg), sm = toreal(st.sum),
        |           ln = tolong(st.len)""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0 && r.getLong(1) == 1L) // first occurrence
    assert(r.getDouble(2) == 7.0 && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 3.25 && r.getDouble(5) == 13.0)
    assert(r.getLong(6) == 4L)
  }

  test("arity errors") {
    intercept[KqlParseException](one("series_add(a)"))
    intercept[KqlParseException](one("series_fir(a)"))
  }
}
