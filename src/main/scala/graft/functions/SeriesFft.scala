package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `series_fft(re [, im])` / `series_ifft(re, im)` — discrete Fourier
  * transform of a complex series, tuple form: returns a struct of the
  * (real, imag) output arrays, consumed via multi-assign
  * `(fr, fi) = series_fft(x)`.
  *
  * The kernel is the direct O(n²) DFT with a SEQUENTIAL inner fold —
  * deliberately, not an FFT: the per-row series in this engine are
  * make-series grids (tens to thousands of points), where the quadratic
  * kernel stays microseconds-per-row and, unlike a recursive FFT, has a
  * replayable operation order (the gate's DuckDB oracle inlines the
  * JVM-computed twiddle literals and re-runs the identical
  * left-associated sums, making the comparison bit-exact). Twiddle
  * angles are computed as ±2π·(k·n)/N in double — the same expression
  * the oracle generator evaluates.
  *
  * Inverse transform divides by N (the ADX convention). Null input,
  * null/NaN/Inf elements, or a length mismatch between re and im → null.
  */
case class SeriesFftExpr(re: Expression, im: Expression, inverse: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(re, im)
  override def dataType: DataType = StructType(Seq(
    StructField("re", ArrayType(DoubleType)),
    StructField("im", ArrayType(DoubleType))))
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
    val xr = doubles(re.eval(input))
    val xi = doubles(im.eval(input))
    if (xr == null || xi == null || xr.length != xi.length) return null
    val n = xr.length
    val or = new Array[Double](n)
    val oi = new Array[Double](n)
    val sign = if (inverse) 2.0 else -2.0
    var k = 0
    while (k < n) {
      var ar = 0.0
      var ai = 0.0
      var j = 0
      while (j < n) {
        val ang = sign * math.Pi * (k.toDouble * j) / n
        val c = math.cos(ang)
        val s = math.sin(ang)
        ar += xr(j) * c - xi(j) * s
        ai += xr(j) * s + xi(j) * c
        j += 1
      }
      if (inverse) { ar /= n; ai /= n }
      or(k) = ar
      oi(k) = ai
      k += 1
    }
    InternalRow(new GenericArrayData(or), new GenericArrayData(oi))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]) =
    copy(re = newChildren(0), im = newChildren(1))
}

object SeriesFftExpr {
  /** The twiddle factors exactly as [[SeriesFftExpr.eval]] computes them —
    * the oracle generator inlines these as SQL double literals so DuckDB
    * multiplies the bit-identical constants. */
  def twiddle(n: Int, k: Int, j: Int, inverse: Boolean): (Double, Double) = {
    val sign = if (inverse) 2.0 else -2.0
    val ang = sign * math.Pi * (k.toDouble * j) / n
    (math.cos(ang), math.sin(ang))
  }
}
