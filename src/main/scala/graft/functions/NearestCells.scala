package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Single-pass centroid-assignment kernel called from generated code: the
  * cosine of the input vector against every centroid, then the indices of
  * the `nProbe` best cells, all in tight loops with zero allocation beyond
  * the output. The Column form it replaces (`zip_with` over a literal
  * array-of-arrays building (score, index) structs, then `array_max` /
  * `array_sort`) is interpreted per row — on IVF assignment it was the
  * whole query cost.
  *
  * Score contract mirrors the HOF form: a centroid whose cosine is
  * undefined (length mismatch, null element, zero norm) scores -∞; ties
  * break to the LARGER index (struct-max/sort semantics of the twin).
  */
object NearestCellsUtil {
  def nearest(
      vec: ArrayData, cents: Array[Double], k: Int, dim: Int,
      nProbe: Int, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val scores = new Array[Double](k)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
    if (n != dim || hasNull) {
      java.util.Arrays.fill(scores, Double.NegativeInfinity)
    } else {
      var nv = 0.0d
      i = 0
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        nv += x * x
        i += 1
      }
      var c = 0
      while (c < k) {
        var dot = 0.0d
        var nc = 0.0d
        var j = 0
        val off = c * dim
        while (j < n) {
          val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
          val y = cents(off + j)
          dot += x * y
          nc += y * y
          j += 1
        }
        val denom = math.sqrt(nv) * math.sqrt(nc)
        scores(c) = if (denom == 0.0d) Double.NegativeInfinity else dot / denom
        c += 1
      }
    }
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var slot = 0
    while (slot < m) {
      var best = -1
      var c = 0
      while (c < k) {
        // ties to the larger index — scanning up with >= keeps the last
        // max. Double.compare, not >=: a NaN score (NaN centroid/vector
        // component) must order GREATEST like Spark's double ordering in
        // the array_max twin — the raw primitive >= is always false
        // against NaN, which would make selection position-dependent
        if (!taken(c) &&
            (best < 0 || java.lang.Double.compare(scores(c), scores(best)) >= 0))
          best = c
        c += 1
      }
      taken(best) = true
      out(slot) = best
      slot += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: indices of the `nProbe` nearest centroids (by
  * cosine, nearest first) for an `array<float|double>` vector, as
  * `array<int>`. Centroids ride along as a codegen reference object —
  * k × dim doubles, flattened row-major.
  */
case class NearestCells(
    child: Expression, cents: Array[Array[Double]], nProbe: Int)
  extends UnaryExpression {
  require(cents.nonEmpty && nProbe >= 1, "need centroids and nProbe >= 1")

  private val k = cents.length
  private val dim = cents.head.length
  private lazy val flat: Array[Double] = cents.flatten

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"NearestCells expects array<float> or array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NearestCellsUtil.nearest(
      input.asInstanceOf[ArrayData], flat, k, dim, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCellsUtil.nearest($c, $ref, $k, $dim, $nProbe, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
