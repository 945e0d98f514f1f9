package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Seasonal/trend/residual decomposition of a numeric series, plus period
  * detection and anomaly scoring — the Kusto `series_decompose` /
  * `series_decompose_anomalies` / `series_periods_detect` surface.
  *
  * Azure's exact algorithms are unpublished, so (repo precedent:
  * `series_outliers`' Tukey kernel) each step is a DOCUMENTED
  * deterministic rule an oracle can replay:
  *
  *  - period detection: sample autocorrelation of the mean-centered
  *    series, `acf(L) = Σ(y_i−μ)(y_{i+L}−μ) / Σ(y_i−μ)²`, candidate lags
  *    `[max(2,minP), min(maxP, n/2)]`, ranked by score (ties → smaller
  *    lag) with harmonic suppression (a lag that is an integer multiple
  *    of an already-chosen lag is skipped); scores clamp to [0,1]
  *  - seasonal component: per-phase MEDIAN (mean-of-central-order-stats)
  *    of the values sharing `i mod period`, centered by subtracting the
  *    mean seasonal value so the trend keeps the series level; period
  *    ≤ 1 (or > n/2, or auto-detect score < 0.6) ⇒ no seasonal
  *  - trend over the deseasonalized series: 'avg' (constant mean),
  *    'linefit' (least squares over x = 0..n−1), or 'none'
  *  - residual = y − seasonal − trend; baseline = seasonal + trend
  *  - anomaly scoring on the residual: the `series_outliers` rank rule —
  *    q(p) = sorted[ceil(p·n)], score = (r−median)/IQR when r is outside
  *    [q1 − t·IQR, q3 + t·IQR] else 0, flag = sign(score); IQR = 0 ⇒ all
  *    zero
  *
  * Null/NaN elements or n < 4 null the whole result (the
  * `series_fit_line_dynamic` contract — decompose needs a filled series;
  * run `series_fill_*` first).
  */
object SeriesDecomposeUtil {

  private def toDoubles(arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getDouble(i)
      if (v.isNaN || v.isInfinite) return null
      out(i) = v
      i += 1
    }
    out
  }

  /** Mean-of-central-order-stats median (shared with series_seasonal). */
  def medianOf(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
  private def median(xs: Array[Double]): Double = medianOf(xs)

  /** q(p) = sorted[ceil(p·n)] (1-based rank rule, as series_outliers). */
  private def rankQ(sorted: Array[Double], p: Double): Double =
    sorted(math.max(1, math.ceil(p * sorted.length).toInt) - 1)

  def detectPeriods(
      y: Array[Double], minP: Int, maxP: Int,
      k: Int): (Array[Double], Array[Double]) = {
    val n = y.length
    val mu = y.sum / n
    var den = 0.0
    var i = 0
    while (i < n) { val d = y(i) - mu; den += d * d; i += 1 }
    if (den == 0.0) return (Array.empty, Array.empty)
    val lo = math.max(2, minP)
    val hi = math.min(maxP, n / 2)
    val scored = (lo to hi).map { lag =>
      var num = 0.0
      var j = 0
      while (j + lag < n) { num += (y(j) - mu) * (y(j + lag) - mu); j += 1 }
      (lag, math.min(1.0, math.max(0.0, num / den)))
    }.filter(_._2 > 0.0).sortBy { case (lag, s) => (-s, lag) }
    val periods = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    scored.foreach { case (lag, s) =>
      if (periods.size < k &&
          !periods.exists { case (p, _) => lag % p == 0 })
        periods += ((lag, s))
    }
    (periods.map(_._1.toDouble).toArray, periods.map(_._2).toArray)
  }

  /** (baseline, seasonal, trend, residual), or null per the null contract.
    * period: > 1 fixed; -1 auto-detect (top ACF period if score ≥ 0.6);
    * 0/1 none. trendKind: "avg" | "linefit" | "none".
    */
  def decompose(arr: ArrayData, period0: Int, trendKind: String)
      : (Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val y = toDoubles(arr)
    if (y == null || y.length < 4) return null
    val n = y.length
    val period = period0 match {
      case -1 =>
        val (ps, ss) = detectPeriods(y, 2, n / 2, 1)
        if (ps.nonEmpty && ss(0) >= 0.6) ps(0).toInt else 0
      case p if p > 1 && p <= n / 2 => p
      case _ => 0
    }
    val seasonal = new Array[Double](n)
    if (period > 1) {
      val phase = Array.tabulate(period)(ph =>
        median((ph until n by period).map(y).toArray))
      val phaseMean = phase.sum / period
      var i = 0
      while (i < n) { seasonal(i) = phase(i % period) - phaseMean; i += 1 }
    }
    val de = Array.tabulate(n)(i => y(i) - seasonal(i))
    val trend = new Array[Double](n)
    trendKind match {
      case "avg" =>
        val m = de.sum / n
        java.util.Arrays.fill(trend, m)
      case "linefit" =>
        val sx = (n - 1).toDouble * n / 2.0
        val sxx = (n - 1).toDouble * n * (2.0 * n - 1.0) / 6.0
        var sy = 0.0
        var sxy = 0.0
        var i = 0
        while (i < n) { sy += de(i); sxy += i * de(i); i += 1 }
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        val icept = (sy - slope * sx) / n
        i = 0
        while (i < n) { trend(i) = icept + slope * i; i += 1 }
      case _ => () // "none": zeros
    }
    val baseline = Array.tabulate(n)(i => seasonal(i) + trend(i))
    val residual = Array.tabulate(n)(i => y(i) - baseline(i))
    (baseline, seasonal, trend, residual)
  }

  /** Forecast (Kusto `series_decompose_forecast`): the LAST `points`
    * elements are excluded from training — their values are IGNORED
    * entirely (they are typically null/zero slots from a make-series
    * over an extended range) — and the result is the baseline over all
    * n slots: the training head's seasonal+trend, with the tail
    * extrapolated (seasonal phase repeats; avg trend stays constant;
    * linefit extends the fitted line at index i; none → 0). Null when
    * the training head is shorter than 4 or contains null/NaN.
    */
  def forecast(arr: ArrayData, points: Int, period0: Int,
      trendKind: String): Array[Double] = {
    val n = arr.numElements()
    val m = n - points
    if (points < 0 || m < 4) return null
    val y = new Array[Double](m)
    var j = 0
    while (j < m) {
      if (arr.isNullAt(j)) return null
      val v = arr.getDouble(j)
      if (v.isNaN || v.isInfinite) return null
      y(j) = v
      j += 1
    }
    val period = period0 match {
      case -1 =>
        val (ps, ss) = detectPeriods(y, 2, m / 2, 1)
        if (ps.nonEmpty && ss(0) >= 0.6) ps(0).toInt else 0
      case p if p > 1 && p <= m / 2 => p
      case _ => 0
    }
    val phase =
      if (period > 1) {
        val ph = Array.tabulate(period)(k =>
          median((k until m by period).map(y).toArray))
        val mean = ph.sum / period
        ph.map(_ - mean)
      } else Array.empty[Double]
    def seas(i: Int): Double = if (period > 1) phase(i % period) else 0.0
    val de = Array.tabulate(m)(i => y(i) - seas(i))
    val (slope, icept) = trendKind match {
      case "avg" => (0.0, de.sum / m)
      case "linefit" =>
        val sx = (m - 1).toDouble * m / 2.0
        val sxx = (m - 1).toDouble * m * (2.0 * m - 1.0) / 6.0
        var sy = 0.0
        var sxy = 0.0
        var i = 0
        while (i < m) { sy += de(i); sxy += i * de(i); i += 1 }
        val sl = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        (sl, (sy - sl * sx) / m)
      case _ => (0.0, 0.0)
    }
    Array.tabulate(n)(i => seas(i) + icept + slope * i)
  }

  /** (flags −1/0/+1, scores, baseline), or null. */
  def anomalies(arr: ArrayData, threshold: Double, period0: Int,
      trendKind: String): (Array[Long], Array[Double], Array[Double]) = {
    val d = decompose(arr, period0, trendKind)
    if (d == null) return null
    val (baseline, _, _, residual) = d
    val n = residual.length
    val sorted = residual.sorted
    val q1 = rankQ(sorted, 0.25)
    val q3 = rankQ(sorted, 0.75)
    val med = rankQ(sorted, 0.5)
    val iqr = q3 - q1
    val flags = new Array[Long](n)
    val scores = new Array[Double](n)
    if (iqr != 0.0) {
      var i = 0
      while (i < n) {
        val r = residual(i)
        if (r > q3 + threshold * iqr) {
          flags(i) = 1L; scores(i) = (r - med) / iqr
        } else if (r < q1 - threshold * iqr) {
          flags(i) = -1L; scores(i) = (r - med) / iqr
        }
        i += 1
      }
    }
    (flags, scores, baseline)
  }
}

/** `series_seasonal(series[, period])` — the per-phase MEDIAN repeated
  * across the series (Kusto's seasonal component; NOT centered — that is
  * `series_decompose`'s seasonal, which subtracts the phase mean so the
  * trend keeps the level). period -1 auto-detects via the ACF rule.
  */
case class SeriesSeasonalExpr(child: Expression, period: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType)
  // null contract fires even for non-nullable children (n<4, NaN element)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getDouble(i)
      if (v.isNaN || v.isInfinite) return null
      y(i) = v
      i += 1
    }
    if (n < 4) return null
    val p = period match {
      case -1 =>
        val (ps, ss) = SeriesDecomposeUtil.detectPeriods(y, 2, n / 2, 1)
        if (ps.nonEmpty && ss(0) >= 0.6) ps(0).toInt else 0
      case q if q > 1 && q <= n / 2 => q
      case _ => 0
    }
    if (p <= 1) return new GenericArrayData(new Array[Double](n))
    val phase = Array.tabulate(p)(ph =>
      SeriesDecomposeUtil.medianOf((ph until n by p).map(y).toArray))
    new GenericArrayData(Array.tabulate(n)(j => phase(j % p)))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `series_fill_linear(series)` — interior null runs interpolate
  * linearly between their non-null neighbors; leading/trailing nulls
  * take the nearest non-null value (Kusto's edge rule); an all-null
  * series passes through unchanged. NaN/∞ elements are treated as
  * values, not gaps.
  */
case class SeriesFillLinearExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val y = new Array[java.lang.Double](n)
    var i = 0
    while (i < n) {
      y(i) = if (arr.isNullAt(i)) null else arr.getDouble(i)
      i += 1
    }
    val known = (0 until n).filter(y(_) != null)
    if (known.isEmpty)
      return new GenericArrayData(y.map(_.asInstanceOf[Any]))
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) =
        if (y(i) != null) y(i)
        else {
          val prev = known.takeWhile(_ < i).lastOption
          val next = known.find(_ > i)
          (prev, next) match {
            case (Some(p), Some(q)) =>
              y(p) + (y(q) - y(p)) * (i - p).toDouble / (q - p)
            case (Some(p), None) => y(p)
            case (None, Some(q)) => y(q)
            case _ => 0.0 // unreachable: known nonempty
          }
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `series_iir(x, b, a)` — infinite impulse response filter:
  * y[n] = (Σ_k b[k]·x[n−k] − Σ_{k≥1} a[k]·y[n−k]) / a[0] (out-of-range
  * x/y terms are 0 — Kusto's zero initial state). Null/NaN in any input,
  * empty b, or a[0] == 0 → null.
  */
case class SeriesIirExpr(x: Expression, b: Expression, a: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(x, b, a)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true

  private def doubles(v: Any): Array[Double] = {
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Double](arr.numElements())
    var i = 0
    while (i < out.length) {
      if (arr.isNullAt(i)) return null
      val d = arr.getDouble(i)
      if (d.isNaN || d.isInfinite) return null
      out(i) = d
      i += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val xs = doubles(x.eval(input))
    val bs = doubles(b.eval(input))
    val as = doubles(a.eval(input))
    if (xs == null || bs == null || as == null) return null
    if (bs.isEmpty || as.isEmpty || as(0) == 0.0) return null
    val n = xs.length
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      var k = 0
      while (k < bs.length) {
        if (i - k >= 0) acc += bs(k) * xs(i - k)
        k += 1
      }
      k = 1
      while (k < as.length) {
        if (i - k >= 0) acc -= as(k) * y(i - k)
        k += 1
      }
      y(i) = acc / as(0)
      i += 1
    }
    new GenericArrayData(y)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(x = c(0), b = c(1), a = c(2))
}

/** Two-segment least-squares fit (Kusto `series_fit_2lines_dynamic`):
  * the split index k minimizing total residual sum of squares over OLS
  * lines fit to [0,k) and [k,n) (each side ≥ 2 points; ties → smallest
  * k; x is the global element index). O(n²) over one series' bins.
  */
object SeriesFit2LinesUtil {
  /** (rsquare, splitIdx, variance, rvariance, lineFit, (lSlope, lIcept),
    * (rSlope, rIcept)), or null for n < 4 / null / non-finite elements.
    */
  def fit(arr: ArrayData): (Double, Int, Double, Double, Array[Double],
      (Double, Double), (Double, Double)) = {
    val n = arr.numElements()
    if (n < 4) return null
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getDouble(i)
      if (v.isNaN || v.isInfinite) return null
      y(i) = v
      i += 1
    }
    // OLS over x = lo..hi (global indices); returns (slope, icept, rss)
    def ols(lo: Int, hi: Int): (Double, Double, Double) = {
      val m = hi - lo
      var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0
      var j = lo
      while (j < hi) {
        sx += j; sy += y(j); sxx += j.toDouble * j; sxy += j * y(j)
        j += 1
      }
      val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
      val icept = (sy - slope * sx) / m
      var rss = 0.0
      j = lo
      while (j < hi) {
        val r = y(j) - (icept + slope * j); rss += r * r; j += 1
      }
      (slope, icept, rss)
    }
    var best = -1
    var bestRss = Double.MaxValue
    var k = 2
    while (k <= n - 2) {
      val rss = ols(0, k)._3 + ols(k, n)._3
      if (rss < bestRss - 1e-12) { bestRss = rss; best = k }
      k += 1
    }
    val (ls, li, _) = ols(0, best)
    val (rs, ri, _) = ols(best, n)
    val fitArr = Array.tabulate(n)(j =>
      if (j < best) li + ls * j else ri + rs * j)
    val mean = y.sum / n
    val variance = y.map(v => (v - mean) * (v - mean)).sum / n
    val rvariance = bestRss / n
    val rsquare = if (variance != 0.0) 1.0 - rvariance / variance else 1.0
    (rsquare, best, variance, rvariance, fitArr, (ls, li), (rs, ri))
  }
}

/** `series_fit_2lines_dynamic(series)` → struct with rsquare, split_idx,
  * variance, rvariance, line_fit, left/right {slope, interception}.
  */
case class SeriesFit2LinesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val seg = StructType(Seq(
    StructField("slope", DoubleType), StructField("interception", DoubleType)))
  override def dataType: DataType = StructType(Seq(
    StructField("rsquare", DoubleType), StructField("split_idx", LongType),
    StructField("variance", DoubleType), StructField("rvariance", DoubleType),
    StructField("line_fit", ArrayType(DoubleType)),
    StructField("left", seg), StructField("right", seg)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = SeriesFit2LinesUtil.fit(input.asInstanceOf[ArrayData])
    if (r == null) null
    else InternalRow(r._1, r._2.toLong, r._3, r._4,
      new GenericArrayData(r._5), InternalRow(r._6._1, r._6._2),
      InternalRow(r._7._1, r._7._2))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `series_decompose(series, period, trend)` →
  * struct<baseline, seasonal, trend, residual> (each array<double>).
  */
case class SeriesDecomposeExpr(
    child: Expression, period: Int, trendKind: String)
    extends UnaryExpression with CodegenFallback {
  private val arr = ArrayType(DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("baseline", arr), StructField("seasonal", arr),
    StructField("trend", arr), StructField("residual", arr)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val d = SeriesDecomposeUtil.decompose(
      input.asInstanceOf[ArrayData], period, trendKind)
    if (d == null) null
    else InternalRow(new GenericArrayData(d._1), new GenericArrayData(d._2),
      new GenericArrayData(d._3), new GenericArrayData(d._4))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `series_decompose_forecast(series, points, period, trend)` →
  * array<double> baseline over all slots, tail extrapolated.
  */
case class SeriesForecastExpr(
    child: Expression, points: Int, period: Int, trendKind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val f = SeriesDecomposeUtil.forecast(
      input.asInstanceOf[ArrayData], points, period, trendKind)
    if (f == null) null else new GenericArrayData(f)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `series_decompose_anomalies(series, threshold, period, trend)` →
  * struct<ad_flag array<long>, ad_score array<double>, baseline>.
  */
case class SeriesAnomaliesExpr(
    child: Expression, threshold: Double, period: Int, trendKind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("ad_flag", ArrayType(LongType)),
    StructField("ad_score", ArrayType(DoubleType)),
    StructField("baseline", ArrayType(DoubleType))))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val d = SeriesDecomposeUtil.anomalies(
      input.asInstanceOf[ArrayData], threshold, period, trendKind)
    if (d == null) null
    else InternalRow(new GenericArrayData(d._1), new GenericArrayData(d._2),
      new GenericArrayData(d._3))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `series_periods_detect(series, min, max, k)` →
  * struct<periods array<double>, scores array<double>>.
  */
case class SeriesPeriodsExpr(
    child: Expression, minP: Int, maxP: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("periods", ArrayType(DoubleType)),
    StructField("scores", ArrayType(DoubleType))))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val y = input.asInstanceOf[ArrayData]
    var i = 0
    val n = y.numElements()
    val xs = new Array[Double](n)
    while (i < n) {
      if (y.isNullAt(i)) return null
      xs(i) = y.getDouble(i)
      i += 1
    }
    if (n < 4) return null
    val (ps, ss) = SeriesDecomposeUtil.detectPeriods(xs, minP, maxP, k)
    InternalRow(new GenericArrayData(ps), new GenericArrayData(ss))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
