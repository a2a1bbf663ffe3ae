package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom sessionization state machine via `flatMapGroupsWithState` — the
  * stateful-processing facility `session_window` can't express: arbitrary
  * per-key state with explicit lifecycle (open → extend → close-by-gap or
  * close-by-timeout) and custom emitted payload.
  *
  * Where [[EventTimeWindows.userSessions]] lets Spark manage window-merge
  * state, this operator owns it: one `OpenSession` per user, extended by
  * in-gap events, emitted when a gap closes it or when the event-time
  * TIMEOUT fires (watermark passed `last + gap` with no newer events) — so
  * the final session of a quiet user still gets emitted, which a pure
  * window aggregation in append mode also does, but here the emission
  * carries custom fields (duration, bounds) computed in the state machine.
  *
  * Scale notes: state lives in the state store partitioned by user key;
  * one `OpenSession` row per ACTIVE user, evicted on close — state size
  * tracks concurrently-active users, not stream length. Works identically
  * on a `MemoryStream` (tests) and any production source.
  */
object StatefulSessions {

  final case class UserEvent(user_id: Long, ts: Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class CompletedSession(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long,
      duration_us: Long)

  /** Completed sessions for `events` (event-time `ts`, watermarked by the
    * caller) with an inactivity gap of `gapMinutes`.
    */
  def sessions(events: Dataset[UserEvent], gapMinutes: Int): Dataset[CompletedSession] = {
    val gapUs = gapMinutes * 60L * 1000000L

    def complete(uid: Long, s: OpenSession): CompletedSession =
      CompletedSession(uid, s.startUs, s.lastUs, s.n, s.lastUs - s.startUs)

    def update(uid: Long, incoming: Iterator[UserEvent],
        state: GroupState[OpenSession]): Iterator[CompletedSession] = {
      if (state.hasTimedOut) {
        // watermark passed last+gap with no newer events: close and evict
        val done = complete(uid, state.get)
        state.remove()
        Iterator.single(done)
      } else {
        val evs = incoming.map(e => e.ts.getTime * 1000L).toArray.sorted
        var open = state.getOption
        val closed = Array.newBuilder[CompletedSession]
        evs.foreach { us =>
          open match {
            case Some(s) if us - s.lastUs > gapUs =>
              closed += complete(uid, s)
              open = Some(OpenSession(us, us, 1))
            case Some(s) =>
              open = Some(OpenSession(s.startUs, math.max(s.lastUs, us), s.n + 1))
            case None =>
              open = Some(OpenSession(us, us, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
        }
        closed.result().iterator
      }
    }

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)(
        Encoders.product[OpenSession], Encoders.product[CompletedSession])
  }
}
