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

  test("zvalue3 equals the bit-by-bit 3-way interleave reference") {
    import spark.implicits._
    def refSpread3(v: Long): Long =
      (0 until 8).map(i => ((v >> i) & 1L) << (3 * i)).sum
    val coords = Seq(0L, 1L, 3L, 85L, 128L, 170L, 254L, 255L)
    val triples = for (x <- coords; y <- coords; z <- coords) yield (x, y, z)
    val got = triples.toDF("x", "y", "z")
      .select(Zorder.zvalue3(col("x"), col("y"), col("z")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    val want = triples.map { case (x, y, z) =>
      refSpread3(x) | (refSpread3(y) << 1) | (refSpread3(z) << 2)
    }
    assert(got === want)
    assert(got.distinct.size === triples.size, "3-way interleave must not collide")
  }

  // Plain-Scala Skilling transform (forward), parameterized by bit width so
  // the b=4 instance can be walked exhaustively — the algorithm is
  // width-generic, so b=4 exhaustive + b=8 sampled pins the b=8 expression.
  private def h3ref(b: Int)(x0in: Long, x1in: Long, x2in: Long): Long = {
    val mask = (1L << b) - 1L
    var (x0, x1, x2) = (x0in & mask, x1in & mask, x2in & mask)
    var q = 1L << (b - 1)
    while (q > 1L) {
      val p = q - 1L
      if ((x0 & q) != 0L) x0 ^= p
      if ((x1 & q) != 0L) x0 ^= p
      else { val t = (x0 ^ x1) & p; x0 ^= t; x1 ^= t }
      if ((x2 & q) != 0L) x0 ^= p
      else { val t = (x0 ^ x2) & p; x0 ^= t; x2 ^= t }
      q >>= 1
    }
    x1 ^= x0; x2 ^= x1
    var t = 0L
    q = 1L << (b - 1)
    while (q > 1L) { if ((x2 & q) != 0L) t ^= q - 1L; q >>= 1 }
    x0 ^= t; x1 ^= t; x2 ^= t
    var h = 0L
    var bit = b - 1
    while (bit >= 0) {
      h = (h << 1) | ((x0 >> bit) & 1L)
      h = (h << 1) | ((x1 >> bit) & 1L)
      h = (h << 1) | ((x2 >> bit) & 1L)
      bit -= 1
    }
    h
  }

  // Skilling inverse (index → axes), for the adjacency walks.
  private def h3inv(b: Int)(h: Long): (Long, Long, Long) = {
    val x = Array(0L, 0L, 0L)
    for (bit <- b - 1 to 0 by -1; i <- 0 to 2)
      x(i) |= ((h >> (bit * 3 + (2 - i))) & 1L) << bit
    val m = 1L << (b - 1)
    var t = x(2) >> 1
    x(2) ^= x(1); x(1) ^= x(0); x(0) ^= t
    var q = 2L
    while (q != (m << 1)) {
      val p = q - 1L
      var i = 2
      while (i >= 0) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
    (x(0), x(1), x(2))
  }

  test("hilbert3: b=4 instance is an exhaustively-verified adjacent bijection; b=8 sampled") {
    // b=4: every one of the 4096 cells, bijection + unit-step adjacency +
    // roundtrip — exhaustive proof of the transform's shape.
    val n4 = 1 << 12
    val pts = (0 until n4).map(h => h3inv(4)(h.toLong))
    assert(pts.distinct.size === n4, "b=4 inverse is not a bijection")
    for (h <- 1 until n4) {
      val (a, b_, c) = pts(h - 1); val (d, e, f) = pts(h)
      assert(math.abs(a - d) + math.abs(b_ - e) + math.abs(c - f) === 1,
        s"b=4 jump at $h")
    }
    pts.zipWithIndex.foreach { case ((x, y, z), h) =>
      assert(h3ref(4)(x, y, z) === h.toLong, s"b=4 roundtrip fail at $h")
    }
    // b=8: sampled contiguous walks (start of curve, middle, end) stay
    // grid-adjacent, and forward∘inverse is the identity on random cells.
    for (start <- Seq(0L, 1L << 20, (1L << 24) - 20001L))
      for (h <- start + 1 until start + 20000) {
        val (a, b_, c) = h3inv(8)(h - 1); val (d, e, f) = h3inv(8)(h)
        assert(math.abs(a - d) + math.abs(b_ - e) + math.abs(c - f) === 1,
          s"b=8 jump at $h")
      }
    val rnd = new scala.util.Random(42)
    (0 until 20000).foreach { _ =>
      val (x, y, z) = (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
        rnd.nextInt(256).toLong)
      assert(h3inv(8)(h3ref(8)(x, y, z)) === ((x, y, z)))
    }
  }

  test("hilbert3_index expression equals the Scala reference (codegen + SQL registration)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(4000)(_ => (rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y", "z")
      .select(graft.functions.Hilbert3Index(col("x"), col("y"), col("z")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (x, y, z) => h3ref(8)(x, y, z) })
    // SQL surface: registered function, analysis-time type checking.
    pts.take(100).toDF("x", "y", "z").createOrReplaceTempView("h3pts")
    val sqlGot = spark.sql("SELECT hilbert3_index(x, y, z) AS h FROM h3pts")
      .collect().map(_.getLong(0)).toSeq
    assert(sqlGot === pts.take(100).map { case (x, y, z) => h3ref(8)(x, y, z) })
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert3_index('a', 1, 2)").collect()
    }
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
