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
