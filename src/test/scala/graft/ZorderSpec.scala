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

  test("hilbert_index is a bijection whose consecutive cells are grid-adjacent") {
    // Plain-Scala reference of the canonical xy→d walk.
    def ref(x0: Long, y0: Long): Long = {
      var (x, y, d, s) = (x0, y0, 0L, 128L)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          val (fx, fy) = if (rx == 1) (255 - x, 255 - y) else (x, y)
          x = fy; y = fx
        }
        s >>= 1
      }
      d
    }
    // Bijection over the full 256×256 grid…
    val inv = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = ref(x.toLong, y.toLong).toInt
      assert(inv(d) == null, s"collision at d=$d")
      inv(d) = (x, y)
    }
    // …whose every step moves to a GRID-ADJACENT cell — the locality
    // property the Z-curve lacks (it jumps at power-of-two boundaries)
    // and the reason Hilbert envelopes are at least as tight.
    for (d <- 1 until 65536) {
      val (x1, y1) = inv(d - 1)
      val (x2, y2) = inv(d)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
    // The codegen expression computes the same mapping.
    val pts = (for (x <- 0L until 256L by 17; y <- 0L until 256L by 13)
      yield (x, y)).toSeq
    import spark.implicits._
    val got = pts.toDF("x", "y")
      .select(graft.functions.HilbertIndex(col("x"), col("y")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (x, y) => ref(x, y) })
  }

  test("hilbert_index rejects non-integral arguments at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert_index('a', 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("datatype_mismatch") &&
      e.getMessage.toLowerCase.contains("integral"))
  }

  test("grid8 propagates NULL instead of clamping it into the last cell") {
    import spark.implicits._
    val got = Seq(Some(150L), None).toDF("v")
      .select(Zorder.grid8(col("v"), lit(100L), lit(199L)).as("g"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got === Seq(Some(128L), None))
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
