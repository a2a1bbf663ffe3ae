package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live consecutive 3-step paths — the streaming twin of ◆ `q_top_paths`
  * and the trigram extension of [[Transitions.pairs]]: each arriving
  * event completes a (prev2, prev1, current) path with the SAME user's
  * two previous event types, so a downstream `groupBy(e1, e2, e3).count`
  * maintains the batch path table incrementally and the trending-paths
  * report becomes a tail instead of a recompute.
  *
  * State per user is the last TWO (us, event_id, type) slots — O(1)
  * however long the stream, the [[Transitions.pairs]] contract one step
  * wider, with the same delivery caveat: in-batch disorder is absorbed
  * (the group sorts each micro-batch by (us, event_id)), cross-batch
  * arrivals older than the stored slots pair in ARRIVAL order (keyed
  * logs deliver per-key in order, so this is the honest O(1) trade;
  * an unordered collector would want a `pairsExact`-style watermark
  * buffer — the [[Transitions.pairsExact]] machinery generalizes
  * verbatim, swap the one-slot fold for this two-slot fold).
  */
object Paths {

  /** `us` is epoch MICROS (`unix_micros(ts)`) — the [[Transitions.TEvent]]
    * ordering contract. */
  final case class PEvent(
      user_id: Long, event_id: Long, event_type: String, us: Long)

  /** Two most-recent slots: `b` is the latest event, `a` the one before;
    * `n` counts filled slots (0, 1, 2). */
  final case class Last2(n: Int, aUs: Long, aEid: Long, aType: String,
      bUs: Long, bEid: Long, bType: String)

  final case class Path(user_id: Long, e1: String, e2: String, e3: String)

  /** Emit one completed trigram per event beyond each user's second.
    * No timeout: a returning user's path context must survive idle gaps
    * (same argument as [[Transitions.pairs]]).
    */
  def trigrams(events: Dataset[PEvent]): Dataset[Path] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, incoming: Iterator[PEvent], state: GroupState[Last2]) =>
          val batch = incoming.toArray.sortBy(e => (e.us, e.event_id))
          var st = state.getOption.getOrElse(
            Last2(0, 0L, 0L, "", 0L, 0L, ""))
          val out = Array.newBuilder[Path]
          batch.foreach { e =>
            if (st.n >= 2) out += Path(uid, st.aType, st.bType, e.event_type)
            st = Last2(math.min(2, st.n + 1), st.bUs, st.bEid, st.bType,
              e.us, e.event_id, e.event_type)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
