package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live metric anomaly monitor — the streaming twin of
  * ◆ `q_zscore_anomaly`: daily event counts accumulate in keyed state,
  * days finalize IN ORDER as the watermark passes their end (the
  * [[GrowthAccounting]] buffering discipline), and each finalized day
  * with a full 7-day trailing baseline emits the batch query's exact
  * row — the sqrt-free integer anomaly decision dev²·(n−1) > 4·n·varN
  * on the same longs, so live rows are bit-identical to the batch
  * monitor's for every closed day.
  *
  * Delivery: per-day counts are commutative sums, so ANY batch split
  * and intra-batch disorder accumulate identically (the Drift
  * contract); counts are NOT idempotent, so exactly-once delivery is
  * assumed upstream (checkpointed sources provide it; contrast with
  * [[Experiment]]'s first-flip flags, which tolerate at-least-once).
  * Stragglers into finalized days drop — a closed day never re-emits.
  *
  * State per metric key: pending day→count pairs (watermark-bounded)
  * + the trailing ≤7 finalized counts — constant size however long the
  * stream runs.
  */
object Anomaly extends Serializable {

  val DayUs: Long = 86400000000L

  final case class MEvent(metric: String, us: Long, ts: Timestamp)
  final case class AState(pendDays: Seq[Long], pendCounts: Seq[Long],
      trailDays: Seq[Long], trailCounts: Seq[Long], lastFinal: Long,
      hasFinal: Boolean)
  final case class AnomalyRow(metric: String, day: Long, y: Long,
      sy: Long, syy: Long, is_anomaly: Long, z: Option[Double])

  def dailyZ(events: Dataset[MEvent]): Dataset[AnomalyRow] = {
    import events.sparkSession.implicits._

    def flush(key: String, st: AState, watermarkUs: Long,
        state: GroupState[AState]): Iterator[AnomalyRow] = {
      val pend = st.pendDays.zip(st.pendCounts)
      val (ready, still) = pend.sortBy(_._1)
        .partition { case (day, _) => (day + 1) * DayUs <= watermarkUs }
      var trail = st.trailDays.zip(st.trailCounts)
      var lastFinal = st.lastFinal
      var hasFinal = st.hasFinal
      val out = ready.flatMap { case (day, y) =>
        // a calendar gap breaks the trailing window's contiguity: the
        // batch twin's ROWS frame slides over OBSERVED days, so carry
        // the trail across gaps exactly as the batch rollup does
        val row =
          if (trail.size == 7) {
            val n = 7L
            val sy = trail.map(_._2).sum
            val syy = trail.map(t => t._2 * t._2).sum
            val dev = n * y - sy
            val varN = n * syy - sy * sy
            val flag = if (dev * dev * (n - 1) > 4 * n * varN) 1L else 0L
            val z =
              if (varN > 0)
                Some(math.floor(dev.toDouble /
                  math.sqrt(varN.toDouble * n / (n - 1)) * 10000.0 + 0.5)
                  / 10000.0)
              else None
            Some(AnomalyRow(key, day, y, sy, syy, flag, z))
          } else None
        trail = (trail :+ (day, y)).takeRight(7)
        lastFinal = day; hasFinal = true
        row
      }
      state.update(AState(still.map(_._1), still.map(_._2),
        trail.map(_._1), trail.map(_._2), lastFinal, hasFinal))
      if (still.nonEmpty)
        state.setTimeoutTimestamp((still.map(_._1).min + 1) * DayUs / 1000L)
      out.iterator
    }

    def update(key: String, incoming: Iterator[MEvent],
        state: GroupState[AState]): Iterator[AnomalyRow] = {
      val wm = state.getCurrentWatermarkMs() * 1000L
      val prev = state.getOption
        .getOrElse(AState(Nil, Nil, Nil, Nil, 0L, hasFinal = false))
      if (state.hasTimedOut) flush(key, prev, wm, state)
      else {
        val add = incoming.map(_.us / DayUs).toSeq
          .filter(day => !prev.hasFinal || day > prev.lastFinal)
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val merged = (prev.pendDays.zip(prev.pendCounts).toMap.toSeq ++
          add.toSeq)
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        flush(key, prev.copy(pendDays = merged.map(_._1),
          pendCounts = merged.map(_._2)), wm, state)
      }
    }

    events.groupByKey(_.metric)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)(
        Encoders.product[AState], Encoders.product[AnomalyRow])
  }
}
