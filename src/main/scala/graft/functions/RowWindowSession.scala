package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Kusto's `row_window_session(ts, maxDuration, idleTimeout)` — the
  * session START of the current row in serialized context, with the
  * GREEDY rule a plain gap-cumsum can't express: a new session begins
  * when the gap from the previous row exceeds `idleTimeout` OR when the
  * current row is more than `maxDuration` past the CURRENT session's
  * start (the restart origin moves to the breaking row, not to
  * start + k·maxDuration).
  *
  * Expressed as a declarative [[AggregateWindowFunction]] — running
  * state is two longs (session start, previous ts) carried by Catalyst's
  * window buffer over the UNBOUNDED PRECEDING..CURRENT ROW frame, so the
  * whole computation stays inside the window exec (no mapPartitions, no
  * state machine): one pass per partition of the serialized order, and
  * under `partition by` it distributes per key like the other serialized
  * window scalars.
  *
  * All three inputs are epoch/duration MICROS as longs; the compiler
  * lowers timestamps via unix_micros and re-wraps the result with
  * timestamp_micros. Kusto's optional 4th restart-condition argument is
  * not supported (documented).
  */
case class RowWindowSession(ts: Expression, maxDuration: Expression,
    idleTimeout: Expression) extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(ts, maxDuration, idleTimeout)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val sessionStart =
    AttributeReference("sessionStart", LongType)()
  private lazy val prevTs = AttributeReference("prevTs", LongType)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(sessionStart, prevTs)

  override val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(null, LongType))

  // evaluated against (old buffer ++ input row) as one projection, so
  // both expressions see the PREVIOUS row's state
  override val updateExpressions: Seq[Expression] = {
    val fresh = Or(
      IsNull(sessionStart),
      Or(
        GreaterThan(Subtract(ts, prevTs), idleTimeout),
        GreaterThan(Subtract(ts, sessionStart), maxDuration)))
    Seq(If(fresh, ts, sessionStart), ts)
  }

  override val evaluateExpression: Expression = sessionStart

  override def prettyName: String = "row_window_session"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RowWindowSession =
    copy(ts = newChildren(0), maxDuration = newChildren(1),
      idleTimeout = newChildren(2))
}
