package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live first-order event-transition pairs — the streaming half of
  * ◆ `q_transitions`: each arriving event is paired with the SAME user's
  * previous event type, so the downstream `groupBy(from, to).count`
  * maintains the batch query's Markov matrix incrementally.
  *
  * The batch twin computes `lag(event_type)` over the per-user time
  * order; a stream cannot lag what has not arrived, so the state machine
  * owns exactly that one value: state = the latest (us, event_id, type)
  * seen per user — ONE row per DISTINCT user ever seen, independent of
  * stream length — and each micro-batch's events are sorted (us,
  * event_id) inside the group before pairing, so in-batch disorder is
  * absorbed. Cross-batch, the pairing assumes per-key event-time-ordered
  * delivery (what a key-partitioned log gives); an arrival older than
  * the stored state is paired in ARRIVAL order rather than re-sorting
  * history — the honest cost of O(1) state, where the batch twin (or the
  * watermark-buffered sessionizer's approach, [[StatefulSessions]])
  * re-orders exactly. StreamSpec proves live ≡ batch counts under
  * in-order batch splits with intra-batch shuffling.
  */
object Transitions {

  /** `us` is epoch MICROS (`unix_micros(ts)`), computed by the caller in
    * the engine's column space — `Timestamp.getTime` is millis, and
    * ordering by millis would silently diverge from the batch twin's
    * micro-precision (us, event_id) order whenever two events share a
    * millisecond (the `\s`-vs-`\x0B` class of latent divergence).
    */
  final case class TEvent(
      user_id: Long, event_id: Long, event_type: String, us: Long)
  final case class LastSeen(us: Long, event_id: Long, event_type: String)
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Pair each event with its predecessor's type. Append-mode stateful
    * map; no timeout — a user's last type stays resident so a returning
    * user still chains correctly (evict-by-timeout would silently break
    * the chain for long-idle users; at 100 TB keys the state store holds
    * one small row per user, the same order as any per-user feature).
    */
  def pairs(events: Dataset[TEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, incoming: Iterator[TEvent], state: GroupState[LastSeen]) =>
          val batch = incoming.toArray.sortBy(e => (e.us, e.event_id))
          var last = state.getOption
          val out = Array.newBuilder[Transition]
          batch.foreach { e =>
            last.foreach(l => out += Transition(uid, l.event_type, e.event_type))
            last = Some(LastSeen(e.us, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
