package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live strictly-ordered funnel — the streaming half of ◆ `q_funnel_steps`:
  * emits an append-only MILESTONE fact the moment a user first completes a
  * stage (stage 1 = signup, 2 = first click strictly after it, 3 = first
  * purchase strictly after that), so `groupBy(stage).count` maintains the
  * batch funnel report incrementally and each milestone is emitted exactly
  * once.
  *
  * Equivalence argument (proved live ≡ batch in StreamSpec): under
  * per-key event-time-ordered delivery the first qualifying event a stage
  * sees IS the batch twin's conditional minimum — t1 is fixed at the
  * first signup, so "min click with us > t1" and "first click after t1 in
  * time order" coincide, and inductively for stage 3. Micro-batch
  * contents are re-sorted (us, event_id) inside the group, absorbing
  * in-batch disorder; `us` is epoch micros computed by the caller
  * (`unix_micros(ts)` — never `Timestamp.getTime`, which is millis).
  *
  * State per user: three longs, monotone, set at most once — the
  * smallest possible funnel state; no timeout, a user converting after a
  * year still chains. Same state-size story as [[Transitions]].
  */
object Funnel {

  final case class FEvent(
      user_id: Long, event_id: Long, event_type: String, us: Long)
  /** -1 = stage not reached. */
  final case class Stages(t1: Long, t2: Long, t3: Long)
  final case class Milestone(user_id: Long, stage: Int, us: Long)

  def milestones(events: Dataset[FEvent],
      steps: (String, String, String) = ("signup", "click", "purchase")): Dataset[Milestone] =
    milestonesTimed(events, Long.MaxValue, steps)

  /** TIMED variant — the live twin of ◆ `q_funnel_window`: a stage only
    * completes if it lands within `windowUs` of the previous one. Under
    * per-key in-order delivery this is still exactly the batch
    * conditional minimum: the first qualifying in-window event IS the
    * min, and an event past the deadline can never be undercut by a
    * later (even later) one — so a missed window is missed forever, in
    * both engines, for the same reason. `windowUs = Long.MaxValue`
    * degenerates to the untimed funnel (how [[milestones]] is defined).
    */
  def milestonesTimed(events: Dataset[FEvent], windowUs: Long,
      steps: (String, String, String) = ("signup", "click", "purchase")): Dataset[Milestone] = {
    import events.sparkSession.implicits._
    val (s1, s2, s3) = steps
    def within(prev: Long, us: Long): Boolean =
      us > prev && us - prev <= windowUs
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, incoming: Iterator[FEvent], state: GroupState[Stages]) =>
          var st = state.getOption.getOrElse(Stages(-1L, -1L, -1L))
          val out = Array.newBuilder[Milestone]
          incoming.toArray.sortBy(e => (e.us, e.event_id)).foreach { e =>
            if (st.t1 < 0 && e.event_type == s1) {
              st = st.copy(t1 = e.us); out += Milestone(uid, 1, e.us)
            } else if (st.t1 >= 0 && st.t2 < 0 && e.event_type == s2 &&
                within(st.t1, e.us)) {
              st = st.copy(t2 = e.us); out += Milestone(uid, 2, e.us)
            } else if (st.t2 >= 0 && st.t3 < 0 && e.event_type == s3 &&
                within(st.t2, e.us)) {
              st = st.copy(t3 = e.us); out += Milestone(uid, 3, e.us)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
