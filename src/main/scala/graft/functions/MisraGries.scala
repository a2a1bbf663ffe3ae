package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a typed [[Aggregator]] — the
  * BOUNDED-MEMORY discovery half of exact distributed heavy hitters
  * (◆ `q_heavy_hitters` is the two-pass composition: this sketch
  * proposes ≤ k candidates, an exact key-partitioned recount disposes).
  *
  * Guarantee (Misra-Gries '82; merge form per Agarwal et al.,
  * "Mergeable Summaries"): after summarizing n items with k counters —
  * in any partitioning, any merge order — every item with true
  * frequency > n/(k+1) is present in the summary. reduce() is the
  * classic decrement-all step (admitting a new item over a full summary
  * charges one count to every resident); merge() sums counters and
  * subtracts the (k+1)-th largest so at most k survive — both steps
  * only ever UNDERCOUNT, and by at most n/(k+1) total, which is what
  * makes the superset guarantee hold under Spark's partial aggregation
  * (ObjectHashAggregate Partial → Final: each map task carries one
  * ≤ k-entry map, the exchange moves k·tasks entries — never the data).
  *
  * The SURVIVING candidate set beyond the guaranteed items is
  * merge-order-dependent — which is why the composition recounts
  * exactly and filters on the true threshold: the final answer is
  * deterministic and cross-engine hash-checkable even though the
  * intermediate sketch is not.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c)            => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        m.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val s = (a.keySet ++ b.keySet).iterator
      .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
    if (s.size <= k) s
    else {
      // subtract the (k+1)-th largest count from everyone; ≤ k survive
      val d = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      s.flatMap { case (w, c) => if (c > d) Some(w -> (c - d)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
