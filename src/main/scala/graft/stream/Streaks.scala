package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live activity-streak tracking — the streaming twin of ◆ `q_streaks`:
  * each user's (longest streak, island count, active days) summary is
  * maintained incrementally and re-emitted whenever the watermark
  * finalizes new active days, so "has anyone hit a 30-day streak" is a
  * tail of this stream, not a nightly recompute over all history.
  *
  * A day's contribution to the run-length fold depends on whether the
  * PREVIOUS calendar day was active, so folding must run in day order —
  * the [[GrowthAccounting]] discipline verbatim: distinct pending days
  * buffer in per-user state until the watermark passes each day's END,
  * then fold ascending into the (prevDay, currentRun, bestRun, islands,
  * days) summary. Late days at or before the finalized frontier drop
  * (the closed-window rule); at-least-once redelivery collapses in the
  * pending SET and the ≤ prevDay guard. State per user: the summary
  * longs + the watermark-bounded pending day ids.
  *
  * Emission contract: one summary row per user per batch in which
  * anything finalized; `n_active_days` strictly increases across a
  * user's emissions, so "the row with the largest n_active_days" IS the
  * user's current summary (what the spec joins against the batch
  * query).
  */
object Streaks extends Serializable {

  val DayUs: Long = 86400000000L

  /** user + epoch-micros event time + the watermarked source timestamp
    * (the [[GrowthAccounting.GEvent]] contract). */
  final case class SEvent(user: Long, us: Long, ts: Timestamp)

  final case class SState(pending: Seq[Long], hasPrev: Boolean,
      prevDay: Long, cur: Long, best: Long, islands: Long, days: Long)

  final case class StreakRow(user: Long, longest_streak: Long,
      n_streaks: Long, n_active_days: Long)

  def summaries(events: Dataset[SEvent]): Dataset[StreakRow] = {

    def flush(uid: Long, st: SState, watermarkUs: Long,
        state: GroupState[SState]): Iterator[StreakRow] = {
      val (ready, still) = st.pending.sorted
        .partition(d => (d + 1) * DayUs <= watermarkUs)
      var s = st
      ready.foreach { d =>
        val extend = s.hasPrev && d == s.prevDay + 1
        val cur = if (extend) s.cur + 1 else 1L
        s = s.copy(hasPrev = true, prevDay = d, cur = cur,
          best = math.max(s.best, cur),
          islands = if (extend) s.islands else s.islands + 1,
          days = s.days + 1)
      }
      val next = s.copy(pending = still)
      state.update(next)
      if (still.nonEmpty)
        state.setTimeoutTimestamp((still.min + 1) * DayUs / 1000L)
      if (ready.nonEmpty)
        Iterator.single(StreakRow(uid, next.best, next.islands, next.days))
      else Iterator.empty
    }

    def update(uid: Long, incoming: Iterator[SEvent],
        state: GroupState[SState]): Iterator[StreakRow] = {
      val wm = state.getCurrentWatermarkMs() * 1000L
      val prev = state.getOption.getOrElse(
        SState(Nil, hasPrev = false, 0L, 0L, 0L, 0L, 0L))
      if (state.hasTimedOut) flush(uid, prev, wm, state)
      else {
        val newDays = incoming
          .map(e => e.us / DayUs)
          .filter(d => !prev.hasPrev || d > prev.prevDay)
          .toSet -- prev.pending.toSet
        flush(uid, prev.copy(pending = prev.pending ++ newDays), wm, state)
      }
    }

    events.groupByKey(_.user)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)(
        Encoders.product[SState], Encoders.product[StreakRow])
  }
}
