package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Kernel accuracy pins for the special functions, against reference
  * values from an independent libm (CPython's math.erf/erfc/gamma/
  * lgamma — published-constant precision).
  */
class MathFnsSpec extends AnyFunSuite {
  private def close(a: Double, b: Double, rel: Double = 1e-12): Boolean =
    math.abs(a - b) <= rel * math.max(1.0, math.abs(b))

  test("erf matches libm to 1e-12 across branches") {
    val ref = Seq(
      0.0 -> 0.0,
      0.3 -> 0.3286267594591274,
      0.5 -> 0.5204998778130465,
      1.0 -> 0.8427007929497149,
      1.5 -> 0.9661051464753108,
      2.0 -> 0.9953222650189527,
      2.5 -> 0.999593047982555,
      3.0 -> 0.9999779095030014,
      4.0 -> 0.9999999845827421,
      -1.2 -> -0.9103139782296353)
    ref.foreach { case (x, e) =>
      assert(close(MathFnsUtil.erf(x), e), s"erf($x) = ${MathFnsUtil.erf(x)}")
    }
  }

  test("erfc matches libm including the continued-fraction tail") {
    val ref = Seq(
      0.5 -> 0.4795001221869535,
      2.0 -> 0.004677734981047265,
      2.5 -> 0.0004069520174449589,
      3.0 -> 2.2090496998585438e-05,
      4.0 -> 1.541725790028002e-08,
      -1.2 -> 1.9103139782296354)
    ref.foreach { case (x, e) =>
      assert(math.abs(MathFnsUtil.erfc(x) - e) <= 1e-12 * math.abs(e) + 1e-18,
        s"erfc($x) = ${MathFnsUtil.erfc(x)} want $e")
    }
  }

  test("welch_test matches closed-form Student-t tails (df = 1, 2)") {
    // equal v/n with n = 2 on both sides forces Welch df = 2 exactly:
    // two-sided p = 1 − t/√(2+t²)
    for (t <- Seq(0.5, 1.0, 2.0, 3.7)) {
      // v=1, n=2 each side ⇒ s = 1 ⇒ t = m1 − m2
      val p = MathFnsUtil.welchTest(t, 1.0, 2, 0.0, 1.0, 2)
      val expect = 1.0 - t / math.sqrt(2.0 + t * t)
      assert(close(p, expect), s"df=2 t=$t: $p vs $expect")
    }
    // df = 1 (Cauchy): p = 1 − (2/π) arctan(t), via ibetaReg directly
    for (t <- Seq(0.3, 1.0, 5.0)) {
      val p = MathFnsUtil.ibetaReg(1.0 / (1.0 + t * t), 0.5, 0.5)
      val expect = 1.0 - 2.0 / math.Pi * math.atan(t)
      assert(close(p, expect), s"df=1 t=$t: $p vs $expect")
    }
    assert(MathFnsUtil.welchTest(1, 1, 1, 0, 1, 2).isNaN) // n1 < 2
  }

  test("gamma/loggamma match libm to 1e-11 incl. reflection") {
    assert(close(MathFnsUtil.gamma(5.5), 52.34277778455352, 1e-11))
    assert(close(MathFnsUtil.gamma(0.3), 2.991568987687591, 1e-11))
    assert(close(MathFnsUtil.gamma(-1.5), 2.3632718012073544, 1e-11))
    assert(close(MathFnsUtil.loggamma(8.2), 8.930929105910348, 1e-11))
    assert(MathFnsUtil.gamma(0.0).isNaN && MathFnsUtil.gamma(-2.0).isNaN)
  }
}
