package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live weekly growth accounting — the streaming twin of
  * ◆ `q_growth_accounting`: each user's active weeks classify as
  * new / retained / resurrected the moment the watermark closes the week,
  * so the per-week rollup of the emitted rows equals the batch query's
  * counts for every closed week — the growth dashboard tailed instead of
  * recomputed (reference: src/streaming_service.py:336 rescans history
  * per refresh).
  *
  * Correctness under disorder: a week's class depends only on the SET of
  * earlier weeks, so classification must run in week order — pending
  * weeks buffer in state until the watermark passes their end (the
  * `Transitions.pairsExact` buffering discipline), then flush ascending
  * against the last finalized week. Late weeks beyond the watermark
  * (≤ lastFinal) are dropped — a closed week never re-emits (the Drift
  * straggler rule). At-least-once redelivery is absorbed by the pending
  * SET (duplicates collapse) and the ≤ lastFinal guard.
  *
  * State per user: the pending week ids (≤ weeks-in-flight, watermark-
  * bounded) + one finalized-week long. The finalized marker must outlive
  * the active window to classify a future resurrection, so state is
  * evicted only at an explicit horizon — `maxIdleWeeks` beyond the last
  * seen week — after which a returning user classifies as `new` again
  * (the CRM re-acquisition convention; set it to the experiment/retention
  * horizon in production).
  */
object GrowthAccounting extends Serializable {

  val WeekUs: Long = 7L * 86400000000L

  /** user + event-time epoch-MICROS (computed upstream via `unix_micros`
    * — the Drift pattern; a `getTime`-derived week would drop sub-ms
    * precision at the boundary) + the watermarked source timestamp. */
  final case class GEvent(user: Long, us: Long, ts: Timestamp)
  final case class GState(pending: Seq[Long], lastFinal: Long, hasFinal: Boolean)
  final case class WeekClass(user: Long, wk: Long, kind: String)

  /** @param events watermarked stream (caller sets `withWatermark` on `ts`)
    * @param maxIdleWeeks evict a user's state this many weeks after their
    *                     newest pending/finalized week (0 = never evict —
    *                     fixture-scale only)
    */
  def weekClasses(events: Dataset[GEvent],
      maxIdleWeeks: Int = 0): Dataset[WeekClass] = {

    def flush(uid: Long, st: GState, watermarkUs: Long,
        state: GroupState[GState]): Iterator[WeekClass] = {
      val (ready, still) = st.pending.sorted
        .partition(wk => (wk + 1) * WeekUs <= watermarkUs)
      var lastFinal = st.lastFinal
      var hasFinal = st.hasFinal
      val out = ready.map { wk =>
        val kind =
          if (!hasFinal) "new"
          else if (lastFinal == wk - 1) "retained"
          else "resurrected"
        lastFinal = wk; hasFinal = true
        WeekClass(uid, wk, kind)
      }
      val next = GState(still, lastFinal, hasFinal)
      state.update(next)
      val horizon = (still ++ (if (hasFinal) Seq(lastFinal) else Nil))
      if (still.nonEmpty)
        state.setTimeoutTimestamp((still.min + 1) * WeekUs / 1000L)
      else if (maxIdleWeeks > 0 && horizon.nonEmpty)
        state.setTimeoutTimestamp(
          (horizon.max + 1 + maxIdleWeeks) * WeekUs / 1000L)
      out.iterator
    }

    def update(uid: Long, incoming: Iterator[GEvent],
        state: GroupState[GState]): Iterator[WeekClass] = {
      val wm = state.getCurrentWatermarkMs() * 1000L
      val prev = state.getOption.getOrElse(GState(Nil, 0L, hasFinal = false))
      if (state.hasTimedOut) {
        if (prev.pending.isEmpty && maxIdleWeeks > 0) {
          // idle horizon reached: evict — a future return is 'new' again
          state.remove()
          Iterator.empty
        } else flush(uid, prev, wm, state)
      } else {
        val newWeeks = incoming
          .map(e => e.us / WeekUs)
          .filter(wk => !prev.hasFinal || wk > prev.lastFinal)
          .toSet -- prev.pending.toSet
        flush(uid, prev.copy(pending = prev.pending ++ newWeeks), wm, state)
      }
    }

    events.groupByKey(_.user)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)(
        Encoders.product[GState], Encoders.product[WeekClass])
  }
}
