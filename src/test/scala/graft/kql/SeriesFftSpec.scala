package graft.kql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.SeriesFftExpr

/** Kernel properties of series_fft / series_ifft: closed-form transforms,
  * linear-algebra identities, the round trip, and the null contract —
  * plus the tuple-form KQL surface.
  */
class SeriesFftSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def fft(re: Seq[Double], im: Seq[Double], inverse: Boolean)
      : (Seq[Double], Seq[Double]) = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    def arrCol(xs: Seq[Double]): Column =
      array(xs.map(v => lit(v)): _*)
    val c = column(SeriesFftExpr(
      expression(arrCol(re)), expression(arrCol(im)), inverse))
    val row = Seq(1).toDF("x").select(c.as("r")).collect()(0)
    val st = row.getStruct(0)
    (st.getSeq[Double](0), st.getSeq[Double](1))
  }

  private def approx(a: Seq[Double], b: Seq[Double], eps: Double = 1e-9) =
    a.length == b.length && a.zip(b).forall { case (x, y) => math.abs(x - y) < eps }

  test("impulse transforms to a flat spectrum") {
    val (re, im) = fft(Seq(1.0, 0, 0, 0), Seq(0.0, 0, 0, 0), inverse = false)
    assert(approx(re, Seq(1.0, 1, 1, 1)) && approx(im, Seq(0.0, 0, 0, 0)))
  }

  test("constant transforms to a DC-only delta") {
    val (re, im) = fft(Seq(1.0, 1, 1, 1), Seq(0.0, 0, 0, 0), inverse = false)
    assert(approx(re, Seq(4.0, 0, 0, 0)) && approx(im, Seq(0.0, 0, 0, 0)))
  }

  test("single cosine concentrates in bins 1 and N-1") {
    val n = 8
    val x = (0 until n).map(j => math.cos(2 * math.Pi * j / n))
    val (re, im) = fft(x, Seq.fill(n)(0.0), inverse = false)
    assert(approx(re, Seq(0.0, 4, 0, 0, 0, 0, 0, 4), 1e-9))
    assert(approx(im, Seq.fill(n)(0.0), 1e-9))
  }

  test("ifft(fft(x)) round-trips, complex input") {
    val xr = Seq(3.0, -1.5, 2.25, 0.0, 7.125, -4.5)
    val xi = Seq(1.0, 0.5, -2.0, 3.25, 0.0, -1.125)
    val (fr, fi) = fft(xr, xi, inverse = false)
    // replay ifft over the fft output via a second expression call
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val c = column(SeriesFftExpr(
      expression(array(fr.map(lit): _*)), expression(array(fi.map(lit): _*)),
      inverse = true))
    val st = Seq(1).toDF("x").select(c.as("r")).collect()(0).getStruct(0)
    assert(approx(st.getSeq[Double](0), xr) && approx(st.getSeq[Double](1), xi))
  }

  test("Parseval: energy preserved up to 1/N") {
    val xr = Seq(1.0, 2, 3, 4, 5, 6, 7, 8)
    val (fr, fi) = fft(xr, Seq.fill(8)(0.0), inverse = false)
    val tEnergy = xr.map(v => v * v).sum
    val fEnergy = fr.zip(fi).map { case (a, b) => a * a + b * b }.sum / 8
    assert(math.abs(tEnergy - fEnergy) < 1e-9)
  }

  test("null contract: null input, null element, length mismatch") {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    def run(re: Column, im: Column): Boolean = // isNull
      Seq(1).toDF("x")
        .select(column(SeriesFftExpr(expression(re), expression(im),
          inverse = false)).as("r"))
        .collect()(0).isNullAt(0)
    assert(run(lit(null).cast("array<double>"), array(lit(1.0))))
    assert(run(array(lit(1.0), lit(null).cast("double")), array(lit(0.0), lit(0.0))))
    assert(run(array(lit(1.0)), array(lit(0.0), lit(0.0)))) // length mismatch
    assert(run(array(lit(Double.NaN)), array(lit(0.0))))
  }

  test("KQL tuple surface: 1-arg fft defaults imaginary to zeros") {
    val cat = new Catalog(spark)
    val df = Kql.run(spark, cat,
      """print s = pack_array(1, 1, 1, 1)
        | | extend (fr, fi) = series_fft(s)
        | | project r0 = toreal(fr[0]), r1 = toreal(fr[1]),
        |     i0 = toreal(fi[0])""".stripMargin)
    val r = df.collect()(0)
    assert(math.abs(r.getDouble(0) - 4.0) < 1e-9)
    assert(math.abs(r.getDouble(1)) < 1e-9)
    assert(math.abs(r.getDouble(2)) < 1e-9)
  }
}
