package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, ExpectsIntegralInputs}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of an 8-bit × 8-bit grid cell — the better-locality
  * sibling of the Morton interleave ([[graft.ops.Zorder]]): consecutive
  * Hilbert indices are always grid-ADJACENT (|Δx|+|Δy| = 1), where the
  * Z-curve jumps across the grid at power-of-two boundaries, so files cut
  * from contiguous Hilbert ranges have min/max envelopes at least as tight
  * — this is why modern lakehouse clustering favors Hilbert over Z-order.
  *
  * Why a custom Catalyst expression (SURVEY.md §4): the xy→d transform is
  * an 8-round loop with a data-dependent rotation (flip + swap) per round
  * — there is no built-in column function for it, a HOF encoding would be
  * CodegenFallback, and the layout pass evaluates it once per ROW of a
  * table being rewritten. The loop below participates in whole-stage
  * codegen. Eval and codegen are the same classic Hilbert rotation
  * (Warren, Hacker's Delight §16-1 family), and the DuckDB oracle unrolls
  * the identical 8 rounds in SQL, so the mapping itself is hash-checked.
  *
  * Precondition: grid coordinates in 0..255 ([[graft.ops.Zorder.grid8]]
  * output); inputs are masked to 8 bits so out-of-range values cannot
  * corrupt the walk.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsIntegralInputs {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    // SQL callers pass INT literals/columns; the generated Java widens
    // (`v & 255L`) so the interpreted path (constant folding included)
    // must accept any integral width too — a bare Long cast would throw
    // ClassCastException on java.lang.Integer.
    var x = a.asInstanceOf[Number].longValue & 255L
    var y = b.asInstanceOf[Number].longValue & 255L
    var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        // canonical rotation: reflect within the FULL 256 grid (n-1-x),
        // then swap — reflecting with the stage size instead breaks the
        // curve's adjacency (ZorderSpec checks all 65536 steps)
        val (fx, fy) = if (rx == 1) (255L - x, 255L - y) else (x, y)
        x = fy
        y = fx
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & 255L;
         |long $y = $b & 255L;
         |long $d = 0L;
         |for (long $s = 128L; $s > 0L; $s >>= 1) {
         |  final long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  final long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $t = $x;
         |    if ($rx == 1L) { $t = 255L - $x; $x = 255L - $y; }
         |    else { $x = $y; }
         |    $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column wrapper over two long grid-coordinate columns (0..255). */
  def apply(x: Column, y: Column): Column =
    ColumnBridge.toColumn(HilbertIndex(
      ColumnBridge.toExpression(x), ColumnBridge.toExpression(y)))
}
