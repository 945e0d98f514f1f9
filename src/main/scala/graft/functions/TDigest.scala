package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.{PercentileDigest, PercentileDigestSerializer}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable percentile sketches — Kusto's `tdigest()` / `merge_tdigest()`
  * aggregates and the `percentile_tdigest()` estimator, the rank-sketch
  * sibling of the `hll`/`hll_merge`/`dcount_hll` family: store one small
  * sketch per fine-grained rollup group, merge sketches across groups
  * later, estimate once. At 100 TB this is the pre-aggregation primitive
  * that turns a full-data percentile re-scan into a merge of kilobyte
  * sketches.
  *
  * The sketch is Spark's Greenwald-Khanna [[PercentileDigest]] (the engine
  * behind `percentile_approx`) rather than a literal t-digest: mergeable,
  * bounded rank error 1/accuracy, binary-serializable, and — below the
  * compression threshold — EXACT under the rank rule `ceil(p·n)`, which is
  * what the DuckDB gate replays (same contract as the approx-quantile
  * gate). Kusto's own tdigest encoding is proprietary either way; what the
  * surface promises is store→merge→estimate, which this keeps.
  */
object TDigest {
  val DefaultAccuracy: Int = ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY

  private val serializer = new PercentileDigestSerializer

  def serialize(d: PercentileDigest): Array[Byte] = serializer.serialize(d)
  def deserialize(b: Array[Byte]): PercentileDigest = serializer.deserialize(b)
}

/** `tdigest(numericCol)` (isMerge = false) and `merge_tdigest(sketchCol)`
  * (isMerge = true) — one aggregate body, two input modes. Output is the
  * serialized sketch (binary); partial/final aggregation both merge
  * sketches, so the plan map-side combines like any Spark aggregate.
  */
case class TDigestAgg(
    child: Expression,
    isMerge: Boolean,
    accuracy: Int = TDigest.DefaultAccuracy,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PercentileDigest] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(child = newChildren.head)

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0d / accuracy)

  override def update(buf: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) buf.merge(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
      else v match {
        case d: Double => buf.add(d)
        case f: Float => buf.add(f.toDouble)
        case l: Long => buf.add(l.toDouble)
        case i: Int => buf.add(i.toDouble)
        case s: Short => buf.add(s.toDouble)
        case b: Byte => buf.add(b.toDouble)
        case d: org.apache.spark.sql.types.Decimal => buf.add(d.toDouble)
        case other => throw new IllegalArgumentException(
          s"tdigest: non-numeric input ${other.getClass.getName}")
      }
    }
    buf
  }

  override def merge(b1: PercentileDigest, b2: PercentileDigest): PercentileDigest = {
    b1.merge(b2); b1
  }

  override def eval(buf: PercentileDigest): Any = TDigest.serialize(buf)

  override def serialize(buf: PercentileDigest): Array[Byte] =
    TDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (isMerge) "merge_tdigest" else "tdigest"
}

/** `percentile_tdigest(sketch, p)` — estimate the p-th percentile
  * (p ∈ [0,100], Kusto's convention) from a serialized sketch. Runs on
  * already-aggregated rollup rows (a handful per query), so the
  * per-row deserialize + CodegenFallback cost is bounded and irrelevant
  * to scan-side codegen. Empty sketch → null.
  */
case class PercentileTDigest(child: Expression, p: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  // an EMPTY sketch (zero rows aggregated) estimates null even though
  // the sketch bytes themselves are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val digest = TDigest.deserialize(input.asInstanceOf[Array[Byte]])
    val out = digest.getPercentiles(Array(p / 100.0d))
    if (out.isEmpty) null else out.head
  }

  override protected def withNewChildInternal(newChild: Expression): PercentileTDigest =
    copy(child = newChild)

  override def prettyName: String = "percentile_tdigest"
}
