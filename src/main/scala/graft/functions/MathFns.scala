package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Kusto's special-function scalars the JDK lacks: `erf` / `erfc` and
  * `gamma` / `loggamma`.
  *
  * erf: Maclaurin series for |x| ≤ 2 (converges to double precision in
  * ≤ 40 terms there), and for larger |x| the Lentz continued fraction
  * for erfc (the standard split — each branch accurate to ~1 ulp ×
  * small constant). Gate values are pinned against published reference
  * constants to 12 decimals.
  *
  * gamma/loggamma: Lanczos approximation (g = 7, the canonical 9
  * coefficients), reflected for x < 0.5 — ~13 significant digits, which
  * the gate compares against DuckDB's libm `gamma`/`lgamma` after
  * rounding (the two implementations agree far beyond the rounded
  * precision on the gate's domain).
  */
object MathFnsUtil {

  def erf(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0) return -erf(-x)
    if (x > 6.5) return 1.0 // < 1 ulp from 1
    if (x <= 2.0) {
      // 2/sqrt(pi) * sum (-1)^n x^(2n+1) / (n! (2n+1))
      val x2 = x * x
      var term = x
      var sum = x
      var n = 1
      while (n < 64 && math.abs(term) > 1e-18 * math.abs(sum)) {
        term = -term * x2 / n
        sum += term / (2 * n + 1)
        n += 1
      }
      2.0 / math.sqrt(math.Pi) * sum
    } else 1.0 - erfc(x)
  }

  def erfc(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0) return 2.0 - erfc(-x)
    if (x <= 2.0) return 1.0 - erf(x)
    // Lentz's algorithm for the classical continued fraction
    // erfc(x) = exp(-x^2)/sqrt(pi) · 1/(x + (1/2)/(x + (2/2)/(x + …)))
    // — partial numerators a_n = n/2, every denominator x
    // modified Lentz (NR §5.2): f0 = C0 = b0 (= x, nonzero here), D0 = 0
    val tiny = 1e-300
    var f = x
    var c = x
    var d = 0.0
    var i = 1
    var delta = 0.0
    do {
      val a = i / 2.0
      d = x + a * d
      if (d == 0.0) d = tiny
      c = x + a / c
      if (c == 0.0) c = tiny
      d = 1.0 / d
      delta = c * d
      f *= delta
      i += 1
    } while (math.abs(delta - 1.0) > 1e-17 && i < 300)
    math.exp(-x * x) / math.sqrt(math.Pi) / f
  }

  // Lanczos g = 7, n = 9 (Godfrey's coefficients — the set used across
  // numerical libraries; public constants)
  private val LanczosG = 7.0
  private val LanczosC = Array(
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7)

  def gamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x <= 0.0 && x == math.floor(x)) return Double.NaN // poles
    if (x < 0.5) {
      // reflection: Γ(x) Γ(1−x) = π / sin(πx); poles at non-positive ints
      val s = math.sin(math.Pi * x)
      if (s == 0.0) return Double.NaN
      return math.Pi / (s * gamma(1.0 - x))
    }
    val z = x - 1.0
    var a = LanczosC(0)
    var i = 1
    while (i < LanczosC.length) {
      a += LanczosC(i) / (z + i)
      i += 1
    }
    val t = z + LanczosG + 0.5
    math.sqrt(2.0 * math.Pi) * math.pow(t, z + 0.5) * math.exp(-t) * a
  }

  /** Regularized incomplete beta I_x(a, b) — continued fraction (NR
    * `betacf`, modified Lentz) with the symmetry flip for convergence.
    * Powers the Student-t tail and thus `welch_test`. */
  def ibetaReg(x: Double, a: Double, b: Double): Double = {
    if (x.isNaN || a.isNaN || b.isNaN || a <= 0 || b <= 0) return Double.NaN
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    // NR ibeta: one shared front factor, direct or flipped CF — no
    // recursion (a mutual flip could never terminate)
    val front = math.exp(
      loggamma(a + b) - loggamma(a) - loggamma(b) +
        a * math.log(x) + b * math.log(1.0 - x))
    if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(x, a, b) / a
    else 1.0 - front * betacf(1.0 - x, b, a) / b
  }

  private def betacf(x: Double, a: Double, b: Double): Double = {
    val tiny = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    var delta = 0.0
    do {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      delta = d * c
      h *= delta
      m += 1
    } while (math.abs(delta - 1.0) > 1e-15 && m < 300)
    h
  }

  /** Two-sided Welch's t-test p-value from summary statistics (Kusto
    * `welch_test`): t = (m1−m2)/√(v1/n1+v2/n2), Welch–Satterthwaite df,
    * p = I_{df/(df+t²)}(df/2, ½). Degenerate input (n < 2, v < 0, zero
    * pooled variance) → NaN → null. */
  def welchTest(m1: Double, v1: Double, n1: Double,
      m2: Double, v2: Double, n2: Double): Double = {
    if (n1 < 2 || n2 < 2 || v1 < 0 || v2 < 0) return Double.NaN
    val u1 = v1 / n1
    val u2 = v2 / n2
    val s = u1 + u2
    if (s <= 0) return Double.NaN
    val t = (m1 - m2) / math.sqrt(s)
    val df = s * s / (u1 * u1 / (n1 - 1.0) + u2 * u2 / (n2 - 1.0))
    ibetaReg(df / (df + t * t), df / 2.0, 0.5)
  }

  def loggamma(x: Double): Double = {
    if (x.isNaN || x <= 0.0 && x == math.floor(x)) return Double.NaN
    if (x < 0.5)
      return math.log(math.abs(math.Pi / math.sin(math.Pi * x))) -
        loggamma(1.0 - x)
    val z = x - 1.0
    var a = LanczosC(0)
    var i = 1
    while (i < LanczosC.length) {
      a += LanczosC(i) / (z + i)
      i += 1
    }
    val t = z + LanczosG + 0.5
    0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
  }
}

/** Regularized incomplete beta as a ternary expression — `welch_test`
  * lowers its t/df arithmetic in Column space (codegen'd) and calls this
  * for the Student-t tail. */
case class IBetaRegExpr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(x: Any, a: Any, b: Any): Any = {
    val r = MathFnsUtil.ibetaReg(x.asInstanceOf[Double],
      a.asInstanceOf[Double], b.asInstanceOf[Double])
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, a, b) => s"""
      ${ev.value} = graft.functions.MathFnsUtil.ibetaReg($x, $a, $b);
      if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IBetaRegExpr =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "ibeta_reg"
}

/** Catalyst expression for the special functions — `op` picks the static
  * kernel; codegen is a direct static call (no UDF). */
case class MathFnExpr(child: Expression, op: String) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Double]
    val r = op match {
      case "erf" => MathFnsUtil.erf(x)
      case "erfc" => MathFnsUtil.erfc(x)
      case "gamma" => MathFnsUtil.gamma(x)
      case "loggamma" => MathFnsUtil.loggamma(x)
    }
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = op match {
      case "erf" => "erf"
      case "erfc" => "erfc"
      case "gamma" => "gamma"
      case "loggamma" => "loggamma"
    }
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MathFnsUtil.$m($c);
      if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MathFnExpr =
    copy(child = newChild)

  override def prettyName: String = op
}
