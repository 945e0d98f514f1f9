package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for streaming sessionization. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** A closed session emitted downstream. */
final case class ClosedSession(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, sum_cents: Long)

private final case class SessionAccum(
    startMicros: Long, lastMicros: Long, n: Long, cents: Long)

/** Streaming gap-based sessionization with explicit per-key state —
  * `flatMapGroupsWithState`, the Spark-native custom-state operator the
  * batch `session_window` path cannot express when sessions must be
  * emitted as they CLOSE (append mode) rather than refined in place.
  *
  * State per user is one open session (start, last-seen, count, cents —
  * O(1) per key). An event inside the gap extends the open session; an
  * event at or past the gap closes and emits it, then opens a new one;
  * with `idleTimeout` set, a processing-time timeout also flushes the open
  * session of an idle key. Semantics match [[graft.functions.Sessionize]]:
  * a session's end is last event + gap, and an event exactly at the gap
  * boundary (`diff == gap`) still merges — `session_window` merges
  * touching intervals; only `diff > gap` opens a new session. StreamingSpec drives it through MemoryStream
  * batches and checks emitted sessions against the batch operator.
  *
  * Note on `idleTimeout`: registering processing-time timeouts makes every
  * micro-batch schedule a follow-up batch (the engine must re-check
  * timers), so `processAllAvailable()` never settles — fine for a real
  * always-on stream, unusable under test. Default is event-driven only.
  */
object StreamingSessionize {

  def sessions(
      events: Dataset[SessionEvent],
      gapSeconds: Long,
      idleTimeout: Option[String] = None): Dataset[ClosedSession] = {
    val gapMicros = gapSeconds * 1000000L
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[SessionAccum]

    def micros(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000
    def stamp(m: Long): Timestamp = {
      val t = new Timestamp(m / 1000L)
      t.setNanos((m % 1000000L).toInt * 1000)
      t
    }
    def close(uid: Long, s: SessionAccum): ClosedSession =
      ClosedSession(uid, stamp(s.startMicros), stamp(s.lastMicros + gapMicros),
        s.n, s.cents)

    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionAccum, ClosedSession](
        OutputMode.Append, timeoutConf) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionAccum]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            val emitted = List.newBuilder[ClosedSession]
            var open = state.getOption
            // micro-batches are unordered; sessionization is order-defined
            for (ev <- batch.toSeq.sortBy(e => micros(e.ts))) {
              val t = micros(ev.ts)
              val cents = math.round(ev.value * 100)
              open match {
                case Some(s) if t - s.lastMicros <= gapMicros =>
                  open = Some(SessionAccum(s.startMicros, t, s.n + 1, s.cents + cents))
                case Some(s) =>
                  emitted += close(uid, s)
                  open = Some(SessionAccum(t, t, 1L, cents))
                case None =>
                  open = Some(SessionAccum(t, t, 1L, cents))
              }
            }
            open.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            emitted.result().iterator
          }
      }
  }
}
