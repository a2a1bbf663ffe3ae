package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live windowed categorical drift — the streaming half of
  * ◆ `q_drift_windowed`: each tumbling event-time window accumulates its
  * per-category counts in keyed state and, the moment the watermark
  * closes the window, emits one row per category with the chi² and
  * total-variation contributions against a fixed broadcast baseline —
  * the drift ALERT stream a 100 TB ingest runs beside its batch monitor.
  *
  * Equivalence (proved live ≡ batch in StreamSpec): counts are
  * commutative merges, so ANY batch split and any intra-batch disorder
  * accumulate the same per-window vector; the emitted arithmetic is the
  * batch query's expression tree evaluated on the same longs (same IEEE
  * op order, same ⌊x·10⁶+½⌋ rounding), so the rows are bit-identical to
  * the batch twin's for every closed window. Late events beyond the
  * watermark: a window whose state was already emitted and removed is
  * closed forever — a straggler finding no state on a closed window is
  * dropped, never resurrects a second emission (pinned in StreamSpec).
  *
  * State per open window: one Map[category → long] — |categories|
  * entries, bounded by the domain, independent of event volume; windows
  * close and free state as the watermark passes, so open-state is
  * O(|categories| · windows-in-flight).
  */
object Drift {

  /** One categorical event: category + event-time epoch-MICROS, with the
    * watermarked source timestamp carried through (Spark requires the
    * watermark column to reach the stateful operator). */
  final case class DEvent(cat: String, us: Long, ts: java.sql.Timestamp)

  final case class WinCounts(counts: Map[String, Long])

  final case class DriftRow(win_start_us: Long, cat: String,
      n_base: Long, n_cur: Long, chi2_c: Option[Double], tv_c: Double)

  /** One numeric two-sample event: which side ('a'/'b'), the PRE-BINNED
    * grid bucket, event-time micros, and the watermarked timestamp. */
  final case class KEvent(side: String, bin: Long, us: Long,
      ts: java.sql.Timestamp)

  final case class KsState(counts: Map[Long, (Long, Long)])

  final case class KsRow(win_start_us: Long, side_a: String, side_b: String,
      n1: Long, n2: Long, ks_num: Long, ks_d: Option[Double])

  /** Live BINNED two-sample KS per tumbling window — the streaming twin
    * of ◆ `q_drift_ks_binned`, completing the drift family's
    * batch/stream symmetry (the windowed monitor previously spoke only
    * chi²). Each window keeps per-bin (count_a, count_b) in keyed state
    * and, when the watermark closes it, emits ONE row with the exact
    * integer KS numerator max|cuma·n2 − cumb·n1| over the bin grid and
    * the round4 D — the identical arithmetic `ksPairOf` runs in batch,
    * evaluated on the same longs, so closed-window rows are
    * bit-identical to a batch replay of the window slice (StreamSpec
    * proves it under cross-batch disorder).
    *
    * Binning is WHY this can stream: the exact-ECDF KS needs every
    * distinct value per window in state (unbounded for a continuous
    * column); the shared histogram grid caps state at ≤ |bins| map
    * entries per open window, the same constant-domain argument the
    * batch twin makes for its single-partition ECDF pass. Callers bin
    * with the SAME `Aggregates.binCol` expression the batch query uses,
    * upstream of the stateful operator. Late events into closed windows
    * drop (the [[windowedChi2]] rule); n1·n2 = 0 windows emit
    * `ks_d = None` (a one-sided window has no two-sample statistic).
    */
  def windowedKsBinned(events: Dataset[KEvent], windowUs: Long,
      sideA: String, sideB: String): Dataset[KsRow] = {
    import events.sparkSession.implicits._
    require(windowUs > 0, s"window must be positive, got $windowUs")
    events
      .groupByKey(e => e.us / windowUs)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (win: Long, incoming: Iterator[KEvent], state: GroupState[KsState]) =>
          val winStartUs = win * windowUs
          val winEndMs = (winStartUs + windowUs) / 1000L
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            val n1 = counts.valuesIterator.map(_._1).sum
            val n2 = counts.valuesIterator.map(_._2).sum
            var cuma = 0L
            var cumb = 0L
            var ksNum = 0L
            counts.toSeq.sortBy(_._1).foreach { case (_, (ca, cb)) =>
              cuma += ca; cumb += cb
              ksNum = math.max(ksNum, math.abs(cuma * n2 - cumb * n1))
            }
            val d =
              if (n1 == 0L || n2 == 0L) None
              else Some(math.floor(ksNum.toDouble /
                (n1 * n2).toDouble * 10000.0 + 0.5) / 10000.0)
            Iterator.single(KsRow(winStartUs, sideA, sideB, n1, n2, ksNum, d))
          } else if (state.exists || state.getCurrentWatermarkMs() < winEndMs) {
            val prev = state.getOption.map(_.counts).getOrElse(Map.empty)
            val merged = incoming.foldLeft(prev) { (m, e) =>
              val (ca, cb) = m.getOrElse(e.bin, (0L, 0L))
              val next =
                if (e.side == sideA) (ca + 1L, cb)
                else if (e.side == sideB) (ca, cb + 1L)
                else (ca, cb)
              m.updated(e.bin, next)
            }
            state.update(KsState(merged))
            state.setTimeoutTimestamp(
              math.max(winEndMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          } else Iterator.empty
      }
  }

  /** @param events   watermarked stream of categorical events (the caller
    *                 sets `withWatermark` on the source timestamp BEFORE
    *                 converting to [[DEvent]])
    * @param baseline per-category baseline counts (tiny — the categorical
    *                 domain), captured into the closure like a broadcast
    * @param windowUs tumbling window length in micros
    * @param allCats  the full category grid — every closed window emits
    *                 one row per grid category, present or not, matching
    *                 the batch twin's (window × category) grid
    */
  def windowedChi2(events: Dataset[DEvent], baseline: Map[String, Long],
      windowUs: Long, allCats: Seq[String]): Dataset[DriftRow] = {
    import events.sparkSession.implicits._
    require(windowUs > 0, s"window must be positive, got $windowUs")
    val tb = baseline.values.sum
    require(tb > 0, "baseline must be non-empty")
    events
      .groupByKey(e => e.us / windowUs)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (win: Long, incoming: Iterator[DEvent], state: GroupState[WinCounts]) =>
          val winStartUs = win * windowUs
          val winEndMs = (winStartUs + windowUs) / 1000L
          if (state.hasTimedOut) {
            // watermark passed the window end: emit the full grid once
            val counts = state.get.counts
            state.remove()
            val tc = counts.values.sum
            allCats.sorted.iterator.map { cat =>
              val nb = baseline.getOrElse(cat, 0L)
              val nc = counts.getOrElse(cat, 0L)
              val e = nb.toDouble * tc / tb
              val chi2 =
                if (nb == 0) None
                else Some(
                  math.floor((nc - e) * (nc - e) / e * 1000000.0 + 0.5) / 1000000.0)
              val tv = math.floor(math.abs(nc.toDouble / tc - nb.toDouble / tb)
                * 1000000.0 + 0.5) / 1000000.0
              DriftRow(winStartUs, cat, nb, nc, chi2, tv)
            }
          } else if (state.exists || state.getCurrentWatermarkMs() < winEndMs) {
            // open window (or first sight of one still ahead of the
            // watermark): fold the micro-batch in and (re-)arm the close
            val prev = state.getOption.map(_.counts).getOrElse(Map.empty)
            val merged = incoming.foldLeft(prev) { (m, e) =>
              m.updated(e.cat, m.getOrElse(e.cat, 0L) + 1L)
            }
            state.update(WinCounts(merged))
            // re-arming after the watermark passed the end would throw;
            // the close then fires on the very next batch instead
            state.setTimeoutTimestamp(
              math.max(winEndMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          } else {
            // no state and the watermark already passed the window end:
            // this window was emitted and closed — drop the stragglers
            Iterator.empty
          }
      }
  }
}
