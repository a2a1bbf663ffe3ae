package graft.functions

import scala.annotation.tailrec

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]]: per-group state is a sorted
  * list capped at `k` (score desc, id asc tiebreak), merged pairwise.
  *
  * Why (vs the `row_number()` window in `q_topn_per_group`): a ranking
  * window must shuffle EVERY row to its group's partition and sort the
  * whole group before it can discard rank > k. This aggregator keeps at
  * most `k` rows of state per group per map task, so partial aggregation
  * (ObjectHashAggregate Partial → Final) bounds the shuffle at
  * k·groups·partitions rows regardless of input size — at 100 TB with a
  * handful of groups that is the difference between shuffling the corpus
  * and shuffling kilobytes. BloomSpec pins the shape: ObjectHashAggregate
  * on both sides of the exchange, no Window node anywhere.
  *
  * Determinism: (score desc, id asc) is a total order whenever ids are
  * unique, so insert/merge order — and therefore partitioning — cannot
  * change the result; the hash gate depends on this.
  */
final class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  // Score comparison must be the SAME total order as Spark's `desc`:
  // NaN sorts greater than every double (and equal to itself), ±0.0 are
  // equal. A bare `>` makes NaN incomparable — reduce() and merge() would
  // then disagree on where a NaN row ranks and the result would depend on
  // partitioning, breaking both the window-equality contract and the hash
  // gate's partition invariance.
  private def gtScore(a: Double, b: Double): Boolean = {
    val an = java.lang.Double.isNaN(a)
    val bn = java.lang.Double.isNaN(b)
    if (an || bn) an && !bn else a > b
  }

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    gtScore(a._1, b._1) || (!gtScore(b._1, a._1) && a._2 < b._2)

  private def insert(l: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    l match {
      case h :: t if better(h, x) => h :: insert(t, x)
      case _                      => x :: l
    }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    if (b.lengthCompare(k) >= 0 && better(b.last, x)) b
    else insert(b, x).take(k)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
    @tailrec
    def go(x: List[(Double, Long)], y: List[(Double, Long)],
           acc: List[(Double, Long)], n: Int): List[(Double, Long)] =
      if (n == k) acc.reverse
      else (x, y) match {
        case (Nil, Nil)         => acc.reverse
        case (hx :: tx, Nil)    => go(tx, Nil, hx :: acc, n + 1)
        case (Nil, hy :: ty)    => go(Nil, ty, hy :: acc, n + 1)
        case (hx :: tx, hy :: _) if better(hx, hy) => go(tx, y, hx :: acc, n + 1)
        case (_, hy :: ty)      => go(x, ty, hy :: acc, n + 1)
      }
    go(a, b, Nil, 0)
  }

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
