package graft

import org.apache.spark.sql.functions._
import graft.ops.Zorder

/** The Morton-interleave math against a plain-Scala bit-by-bit reference,
  * plus the clamp contract [[Zorder.grid8]] makes for incremental appends
  * under pinned bounds.
  */
class ZorderSpec extends SparkSpec {

  private def refSpread(v: Long): Long =
    (0 until 8).map(i => ((v >> i) & 1L) << (2 * i)).sum

  private def evalZ(pairs: Seq[(Long, Long)]): Seq[Long] = {
    import spark.implicits._
    pairs.toDF("x", "y")
      .select(Zorder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("zvalue equals the bit-by-bit reference on the full grid corner set") {
    val coords = Seq(0L, 1L, 2L, 3L, 85L, 128L, 170L, 200L, 254L, 255L)
    val pairs = for (x <- coords; y <- coords) yield (x, y)
    val got = evalZ(pairs)
    val want = pairs.map { case (x, y) => refSpread(x) | (refSpread(y) << 1) }
    assert(got === want)
    // Interleaving is a bijection grid² → 16 bits: no two pairs collide.
    assert(got.distinct.size === pairs.size)
  }

  test("zvalue is monotone in each dimension with the other fixed") {
    for (fixed <- Seq(0L, 7L, 128L, 255L)) {
      val xs = evalZ((0L to 255L).map(v => (v, fixed)))
      val ys = evalZ((0L to 255L).map(v => (fixed, v)))
      assert(xs === xs.sorted && xs.distinct.size === xs.size,
        s"x-monotonicity broken at y=$fixed")
      assert(ys === ys.sorted && ys.distinct.size === ys.size,
        s"y-monotonicity broken at x=$fixed")
    }
  }

  test("grid8 clamps out-of-range appends to the boundary cells") {
    import spark.implicits._
    // Bounds pinned to [100, 199]; a later batch carries 0, 99, 250, -5.
    val got = Seq(100L, 199L, 0L, 99L, 250L, -5L).toDF("v")
      .select(Zorder.grid8(col("v"), lit(100L), lit(199L)).as("g"))
      .collect().map(_.getLong(0)).toSeq
    assert(got(0) === 0L && got(1) === 253L) // in-range: floor-scaled
    assert(got(2) === 0L && got(3) === 0L)   // below: first cell
    assert(got(4) === 255L)                  // above: last cell
    assert(got(5) === 0L)                    // negative: first cell, no
                                             // truncation-toward-zero garbage
  }
}
