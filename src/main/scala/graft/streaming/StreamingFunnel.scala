package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for the streaming funnel. */
final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** An emitted conversion (first → second within the window). */
final case class Conversion(
    user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
    duration_sec: Long)

private final case class FunnelPending(startMicros: Long)

/** Streaming 2-step conversion funnel with explicit per-key state — the
  * streaming twin of the batch funnel chain's first hop (the
  * `funnel_sequence` earliest-chain rule): per key, the EARLIEST
  * unconverted `first` event is the pending start; the next `second`
  * within `windowSeconds` emits a conversion and clears it, after which a
  * later `first` may open a new one. A `second` past the window clears
  * the expired start without emitting (it can never convert). State per
  * key is one long — O(1), the flatMapGroupsWithState minimum.
  *
  * Ordering contract: micro-batches are unordered internally, so each
  * batch's group sorts by event time before the walk; LATE events that
  * arrive in a later micro-batch than their successors are a documented
  * approximation (the batch operator is the exact replay — lambda
  * architecture, the StreamingSessionize precedent).
  */
object StreamingFunnel {

  def conversions(
      events: Dataset[FunnelEvent],
      first: String,
      second: String,
      windowSeconds: Long): Dataset[Conversion] = {
    val winMicros = windowSeconds * 1000000L
    implicit val outEnc = Encoders.product[Conversion]
    implicit val stateEnc = Encoders.product[FunnelPending]

    def micros(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000
    def stamp(m: Long): Timestamp = {
      val t = new Timestamp(m / 1000L)
      t.setNanos((m % 1000000L).toInt * 1000)
      t
    }

    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelPending, Conversion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelPending]) =>
          val emitted = List.newBuilder[Conversion]
          var pending = state.getOption
          for (ev <- batch.toSeq.sortBy(e => micros(e.ts))) {
            val t = micros(ev.ts)
            ev.event_type match {
              case `first` =>
                // earliest start wins: keep an existing pending
                if (pending.isEmpty) pending = Some(FunnelPending(t))
              case `second` =>
                pending match {
                  case Some(p) if t - p.startMicros <= winMicros && t > p.startMicros =>
                    emitted += Conversion(uid, stamp(p.startMicros), stamp(t),
                      (t - p.startMicros) / 1000000L)
                    pending = None
                  case Some(p) if t - p.startMicros > winMicros =>
                    pending = None // expired — can never convert
                  case _ => ()
                }
              case _ => ()
            }
          }
          pending match {
            case Some(p) => state.update(p)
            case None => state.remove()
          }
          emitted.result().iterator
      }
  }
}
