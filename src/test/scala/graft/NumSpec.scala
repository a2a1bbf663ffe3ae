package graft

import org.apache.spark.sql.functions._

import graft.ops.Num

/** `Num.roundAt`'s cross-engine contract (r11 ADVICE): the floor form
  * must PROPAGATE non-finite inputs the way DuckDB's double-space
  * `floor(x*10^n+0.5)/10^n` does — Spark's `floor(double)` returns
  * BIGINT, so the unguarded form mapped NaN → 0.0 and ±Inf → clamped
  * longs, a silent cross-engine divergence on any NaN-capable gated
  * column (corr/stddev_samp on a degenerate group).
  */
class NumSpec extends SparkSpec {

  private def one(x: Double, n: Int): Double = {
    import spark.implicits._
    Seq(x).toDF("x").select(Num.roundAt(col("x"), n).as("r"))
      .collect()(0).getDouble(0)
  }

  test("roundAt propagates NaN and ±Inf (DuckDB floor-form behavior)") {
    assert(one(Double.NaN, 4).isNaN)
    assert(one(Double.PositiveInfinity, 4) === Double.PositiveInfinity)
    assert(one(Double.NegativeInfinity, 2) === Double.NegativeInfinity)
  }

  test("roundAt is unchanged on the finite data domain") {
    // the r11 q_quality_score doc: 0.25375's nearest double is a hair
    // below the half-way point, so BOTH engines' floor form says 0.2537
    // (native Spark round said 0.2538 — the divergence the form fixed)
    assert(one(0.25375, 4) === 0.2537)
    assert(one(1.00004, 4) === 1.0)
    // -2.555's nearest double sits just BELOW the half (×100 =
    // -255.50000000000003), so the floor form rounds away: -2.56
    assert(one(-2.555, 2) === -2.56)
    assert(one(123.456789, 3) === 123.457)
    assert(one(0.0, 4) === 0.0)
  }

  test("roundAt passes huge magnitudes through instead of long-clamping") {
    // beyond 2^63/10^n the unguarded floor() clamps to Long.MaxValue;
    // a double there has no fractional part at scale n, so identity is
    // the correct (and DuckDB-equal) answer
    val big = 1.0e19
    assert(one(big, 4) === big)
    assert(one(-big, 4) === -big)
  }

  test("roundAt keeps the floor form up to the true clamp boundary") {
    // the band [9.0e18/10^n, 2^63/10^n) does NOT clamp — the floor form
    // is exact there and must stay active (r12 ADVICE: an earlier
    // 9.0e18 guard replaced it with identity, re-opening a 1-ulp
    // cross-engine divergence in a previously-safe band)
    val x = 9.1e14 // ×10^4 = 9.1e18 < 2^63
    assert(one(x, 4) === x)
    assert(one(-x, 4) === -x)
    // and no Long clamp leaks through (clamped would read ~9.2233e14)
    assert(one(9.2e14, 4) === 9.2e14)
  }
}
