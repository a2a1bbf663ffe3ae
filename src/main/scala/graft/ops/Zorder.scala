package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) bit interleaving on an 8-bit × 8-bit grid — shared by
  * the layout audit (`q_zorder_skip`) and the physical writer
  * ([[graft.sources.Layout]]). Two dimensions are normalized to 0..255
  * against their data min/max and their bits interleaved with the classic
  * shift-or spread; locality in Z-value then implies locality in BOTH
  * dimensions, which is what makes per-file min/max envelopes tight enough
  * to prune 2-D query boxes. Pure integer arithmetic end to end, so every
  * derived number is exactly reproducible in the DuckDB oracle.
  */
object Zorder {

  /** Spread an 8-bit value's bits to the even positions of 16 bits. */
  def spread8(c: Column): Column = {
    val t1 = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0FL))
    val t2 = t1.bitwiseOR(shiftleft(t1, 2)).bitwiseAND(lit(0x3333L))
    t2.bitwiseOR(shiftleft(t2, 1)).bitwiseAND(lit(0x5555L))
  }

  /** Normalize `c` in [lo, hi] to the 0..255 grid (integer floor-scaling —
    * identical to DuckDB's `((c - lo) * 256) // (hi - lo + 1)`; in-range
    * values are non-negative, where `div` truncation = floor). The result
    * is CLAMPED to 0..255: [[graft.sources.Layout]] pins [lo, hi] across
    * incremental appends, so a later batch may carry out-of-range values —
    * unclamped, grid ≥ 256 would survive [[spread8]]'s masks with a
    * SMALLER z-contribution than grid 255 (bit 8 aliases under 0x0F0F)
    * and negative grids would shift garbage, silently shredding the
    * file envelopes the layout exists for. Out-of-range rows land in the
    * edge cells instead, which only widens the two boundary files. For
    * in-range data (every oracle-checked path derives lo/hi from the
    * data) the clamp is an exact no-op, so the DuckDB twin needs none.
    *
    * A NULL dimension propagates as NULL (explicit guard — `least`/
    * `greatest` skip NULLs, so the bare clamp would send a null row to
    * grid 255 and silently widen the last file's envelope instead).
    */
  def grid8(c: Column, lo: Column, hi: Column): Column =
    when(c.isNull || lo.isNull || hi.isNull, lit(null).cast("long"))
      .otherwise(greatest(lit(0L), least(lit(255L),
        call_function("div", (c - lo) * lit(256L), hi - lo + lit(1L)))))

  /** 16-bit Z-value of two 0..255 grid coordinates. */
  def zvalue(xg: Column, yg: Column): Column =
    spread8(xg).bitwiseOR(shiftleft(spread8(yg), 1))

  /** Spread an 8-bit value's bits to every THIRD position of 24 bits —
    * the 3-D sibling of [[spread8]] (same shift-or spread, masks for a
    * stride of 3). DuckDB twin uses the identical integer masks.
    */
  def spread3_8(c: Column): Column = {
    val t1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00F00FL))
    val t2 = t1.bitwiseOR(shiftleft(t1, 4)).bitwiseAND(lit(0x0C30C3L))
    t2.bitwiseOR(shiftleft(t2, 2)).bitwiseAND(lit(0x249249L))
  }

  /** 24-bit Morton value of three 0..255 grid coordinates — locality in
    * the value implies locality in ALL THREE dimensions, which is what a
    * layout clustered for 3-D-selective queries needs ([[spread8]]'s
    * 2-D envelope argument, one dimension wider).
    */
  def zvalue3(xg: Column, yg: Column, zg: Column): Column =
    spread3_8(xg)
      .bitwiseOR(shiftleft(spread3_8(yg), 1))
      .bitwiseOR(shiftleft(spread3_8(zg), 2))
}
