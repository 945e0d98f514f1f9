package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.SeriesDecomposeUtil
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Differential + identity pins for the series_decompose family. */
class SeriesDecomposeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val cat = {
    val c = new Catalog(spark)
    c.register("t", Seq((1L, 2L)).toDF("id", "x"))
    c
  }
  private def run(kql: String) = Kql.run(spark, cat, kql)

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)

  test("kernel: periodic series decomposes exactly (period given)") {
    // y = [0,4,0,4,...]: phase medians [0,4], centered seasonal [-2,2],
    // deseasonalized constant 2 → avg trend 2, residual all zero
    val y = arr(0, 4, 0, 4, 0, 4, 0, 4)
    val (baseline, seasonal, trend, residual) =
      SeriesDecomposeUtil.decompose(y, 2, "avg")
    assert(seasonal.toSeq == Seq(-2.0, 2.0, -2.0, 2.0, -2.0, 2.0, -2.0, 2.0))
    assert(trend.toSeq.forall(_ == 2.0))
    assert(residual.toSeq.forall(_ == 0.0))
    assert(baseline.toSeq == Seq(0.0, 4.0, 0.0, 4.0, 0.0, 4.0, 0.0, 4.0))
  }

  test("kernel: baseline + residual reconstructs the series (identity)") {
    val ys = Array(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0)
    for (trend <- Seq("avg", "linefit", "none"); p <- Seq(-1, 0, 2, 3)) {
      val d = SeriesDecomposeUtil.decompose(arr(ys: _*), p, trend)
      assert(d != null)
      val (baseline, seasonal, tr, residual) = d
      ys.indices.foreach { i =>
        assert(math.abs(baseline(i) + residual(i) - ys(i)) < 1e-9,
          s"trend=$trend p=$p i=$i")
        assert(math.abs(seasonal(i) + tr(i) - baseline(i)) < 1e-9)
      }
    }
  }

  test("kernel: linefit trend recovers a pure line") {
    val y = arr((0 until 12).map(i => 2.0 * i + 5.0): _*)
    val (_, seasonal, trend, residual) =
      SeriesDecomposeUtil.decompose(y, 0, "linefit")
    assert(seasonal.forall(_ == 0.0))
    (0 until 12).foreach(i => assert(math.abs(trend(i) - (2.0 * i + 5.0)) < 1e-9))
    assert(residual.forall(r => math.abs(r) < 1e-9))
  }

  test("kernel: period auto-detection finds the true period") {
    val y = arr((0 until 21).map(i => Seq(0.0, 3.0, 6.0)(i % 3)): _*)
    val (ps, ss) = SeriesDecomposeUtil.detectPeriods(
      Array.tabulate(21)(i => Seq(0.0, 3.0, 6.0)(i % 3)), 2, 10, 3)
    assert(ps.headOption.contains(3.0), ps.toSeq)
    assert(ss.head > 0.6)
    // harmonics of 3 (6, 9) are suppressed, anticorrelated lags filtered
    assert(!ps.tail.exists(p => p % 3 == 0), ps.toSeq)
    // and decompose(-1) uses it
    val (_, seasonal, _, _) = SeriesDecomposeUtil.decompose(y, -1, "avg")
    assert(seasonal.distinct.sorted.toSeq == Seq(-3.0, 0.0, 3.0))
  }

  test("kernel: anomaly flags fire on an injected spike only") {
    val base = Array.tabulate(24)(i => Seq(1.0, 2.0, 3.0, 2.0)(i % 4) +
      (i % 7) * 0.01) // slight jitter so the residual IQR is nonzero
    base(13) += 50.0 // spike
    val (flags, scores, baseline) = SeriesDecomposeUtil.anomalies(
      arr(base: _*), 1.5, 4, "linefit")
    assert(flags(13) == 1L)
    assert(scores(13) > 1.5)
    assert(flags.count(_ != 0L) <= 3, flags.toSeq) // spike dominates
    assert(baseline.length == 24)
  }

  test("kernel: null element / short series null out") {
    assert(SeriesDecomposeUtil.decompose(
      new GenericArrayData(Array[Any](1.0, null, 3.0, 4.0)), 0, "avg") == null)
    assert(SeriesDecomposeUtil.decompose(arr(1, 2, 3), 0, "avg") == null)
  }

  test("kql: decompose bag fields extract and reconstruct") {
    val r = run(
      """t | extend s = pack_array(0, 4, 0, 4, 0, 4, 0, 4)
        | | extend d = series_decompose(s, 2, 'avg')
        | | project b0 = toreal(d.baseline[0]), b1 = toreal(d.baseline[1]),
        |     r0 = toreal(d.residual[0]), t0 = toreal(d.trend[0]),
        |     se1 = toreal(d.seasonal[1])""".stripMargin).collect().head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 2.0)
  }

  test("kql: periods_detect on an exactly periodic series") {
    val r = run(
      """print pd = series_periods_detect(
        |    pack_array(0, 3, 6, 0, 3, 6, 0, 3, 6, 0, 3, 6, 0, 3, 6, 0, 3, 6),
        |    2, 8, 2)
        | | project p1 = toreal(pd.periods[0]), s1 = toreal(pd.scores[0]),
        |     p2 = toreal(pd.periods[1])""".stripMargin).collect().head
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 90.0 / 108.0)
    assert(r.isNullAt(2)) // harmonics suppressed, negatives filtered
  }

  test("series_seasonal: uncentered phase medians; -1 auto-detects") {
    val r = run(
      """print s = strcat_array(series_seasonal(
        |    pack_array(1, 5, 1, 5, 1, 5), 2), ','),
        |  auto = strcat_array(series_seasonal(
        |    pack_array(1, 5, 1, 5, 1, 5, 1, 5)), ','),
        |  none = strcat_array(series_seasonal(pack_array(1, 2, 3, 4), 0), ',')
        |""".stripMargin).collect().head
    assert(r.getString(0) == "1.0,5.0,1.0,5.0,1.0,5.0")
    assert(r.getString(1) == "1.0,5.0,1.0,5.0,1.0,5.0,1.0,5.0")
    assert(r.getString(2) == "0.0,0.0,0.0,0.0")
  }

  test("series_iir: feedback recursion and null contracts") {
    val r = run(
      """print y = strcat_array(series_iir(pack_array(1, 1, 1, 1),
        |    pack_array(1), pack_array(1, -0.5)), ','),
        |  fir = strcat_array(series_iir(pack_array(1, 2, 3),
        |    pack_array(1, 1), pack_array(1)), ','),
        |  bad = series_iir(pack_array(1, 2), pack_array(1), pack_array(0))
        |""".stripMargin).collect().head
    assert(r.getString(0) == "1.0,1.5,1.75,1.875")
    assert(r.getString(1) == "1.0,3.0,5.0") // b=[1,1]: x[n]+x[n-1]
    assert(r.isNullAt(2)) // a[0] == 0
  }

  test("multi-array co-sort permutes paired arrays by the first") {
    val r = run(
      """print s = array_sort_asc(pack_array(3, 1, 2),
        |                         pack_array('c', 'a', 'b')),
        |      sd = array_sort_desc(pack_array(1, 3, 2),
        |                           pack_array(9, 7, 8)),
        |      bad = array_sort_asc(pack_array(1, 2), pack_array(9))
        | | project k0 = strcat_array(s[0], ','),
        |     k1 = strcat_array(s[1], ','),
        |     d = strcat_array(sd[1], ','), bad""".stripMargin)
      .collect().head
    assert(r.getString(0) == "1,2,3")
    assert(r.getString(1) == "a,b,c")
    assert(r.getString(2) == "7,8,9")
    assert(r.isNullAt(3)) // length mismatch → null
  }

  test("multi-array co-sort accepts dynamic (variant) arrays") {
    // ADVICE r7: a KT.Var first array used to cast to array<variant> and
    // hit DATATYPE_MISMATCH.INVALID_ORDERING_TYPE; it now sorts via the
    // cross-type total-order byte key
    val r = run(
      """print s = array_sort_asc(todynamic('[3, 1, 2]'),
        |                         pack_array('c', 'a', 'b')),
        |      p = array_sort_desc(pack_array(2, 1, 3),
        |                          todynamic('["x", "y", "z"]'))
        | | project k0 = strcat_array(s[0], ','),
        |     k1 = strcat_array(s[1], ','),
        |     d1 = strcat_array(p[1], ',')""".stripMargin).collect().head
    assert(r.getString(0) == "1,2,3")
    assert(r.getString(1) == "a,b,c")
    assert(r.getString(2) == "z,x,y") // desc by first: 3,2,1 → z,x,y
  }

  test("null contract returns null (not NPE) for non-nullable children") {
    // ADVICE r7 (high): nullSafeEval returning null without nullable=true
    // crashed codegen'd consumers when the child was a pack_array literal
    val r = run(
      """print d = series_decompose(pack_array(1, 2, 3)),
        |  s = series_seasonal(pack_array(1, 2, 3)),
        |  f = series_fit_2lines_dynamic(pack_array(1, 2, 3)),
        |  a = series_decompose_anomalies(pack_array(1, 2, 3)),
        |  p = series_periods_detect(pack_array(1, 2, 3), 2, 8, 1)
        | | project dn = isnull(d), sn = isnull(s), fn = isnull(f),
        |     an = isnull(a), pn = isnull(p)""".stripMargin).collect().head
    (0 until 5).foreach(i => assert(r.getBoolean(i), s"col $i"))
  }

  test("series_decompose_forecast ignores tail values, extends baseline") {
    val r = run(
      """print f = series_decompose_forecast(
        |        pack_array(1, 5, 1, 5, 1, 5, 1, 5, 99, 99), 2, 2, 'avg'),
        |  g = series_decompose_forecast(
        |        pack_array(2, 4, 6, 8, 10, 12, 0, 0), 2, 0, 'linefit'),
        |  bad = series_decompose_forecast(pack_array(1, 2, 3, 0), 2)
        | | project fs = strcat_array(f, ','), g6 = toreal(g[6]),
        |     g7 = toreal(g[7]), bn = isnull(bad)""".stripMargin)
      .collect().head
    // tail 99s are ignored (training = the 8-slot period-2 head); the
    // forecast repeats the phases
    assert(r.getString(0) == "1.0,5.0,1.0,5.0,1.0,5.0,1.0,5.0,1.0,5.0")
    assert(r.getDouble(1) == 14.0 && r.getDouble(2) == 16.0)
    assert(r.getBoolean(3)) // train head of 2 < 4 → null
  }

  test("multi-assign tuple functions bind struct fields positionally") {
    val r = run(
      """print s = pack_array(1, 9, 5, 13)
        | | extend (mn, mni, mx, mxi, av, sd, vr) = series_stats(s),
        |          (rsq, sl, v1, rv, ic, lf) = series_fit_2lines(s)
        | | project mn, mni, mx, mxi, av, sl""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 1.0 && r.getLong(1) == 0L)
    assert(r.getDouble(2) == 13.0 && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 7.0)
    assert(r.getLong(5) >= 0L) // split_idx (2lines field #2) is a long
  }

  test("series_stats: a null element nulls the whole tuple") {
    // ADX default ignore_nonfinite=false — a null-bearing series yields
    // null stats, not a mix of null-skipping min/max with 0-coalesced
    // sums
    val r = run(
      """print s = todynamic('[1, null, 5]')
        | | extend (mn, mni, mx, mxi, av, sd, vr) = series_stats(s)
        | | project n1 = isnull(mn), n2 = isnull(av), n3 = isnull(vr)"""
        .stripMargin).collect().head
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("multi-assign on a non-struct expression errors clearly") {
    val e = intercept[Exception](run(
      "print x = 1 | extend (a, b) = strcat('u', 'v') | project a"
    ).collect())
    assert(e.getMessage.contains("struct-valued"))
  }

  test("strcat_array accepts variant arrays") {
    val r = run(
      """print s = strcat_array(todynamic('[1, "x", true]'), '|')"""
    ).collect().head
    assert(r.getString(0) == "1|x|true")
  }

  test("series_fill_linear: interior interpolation, edge nearest") {
    val r = run(
      """print a = strcat_array(series_fill_linear(
        |      todynamic('[1, null, null, 4]')), ','),
        |  e = strcat_array(series_fill_linear(
        |      todynamic('[null, 2, null, 6, null]')), ','),
        |  alln = series_fill_linear(todynamic('[null, null]'))
        | | project a, e, n0 = tostring(alln[0])""".stripMargin)
      .collect().head
    assert(r.getString(0) == "1.0,2.0,3.0,4.0")
    assert(r.getString(1) == "2.0,2.0,4.0,6.0,6.0")
    assert(r.isNullAt(2)) // all-null passes through (null elem)
  }

  test("kql: anomalies flags round-trip") {
    val r = run(
      """t | extend s = pack_array(1, 2, 3, 2, 2, 3, 4, 3, 3, 4, 60, 4,
        |                          4, 5, 6, 5)
        | | extend a = series_decompose_anomalies(s, 1.5, 4, 'none')
        | | project f10 = tolong(a.ad_flag[10]), f0 = tolong(a.ad_flag[0]),
        |     s10 = toreal(a.ad_score[10])""".stripMargin).collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 0L)
    assert(r.getDouble(2) > 1.5)
  }
}
