package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, ExpectsIntegralInputs}
import org.apache.spark.sql.types.{DataType, LongType}

/** 3-D Hilbert-curve index of an 8-bit³ grid cell — the third dimension the
  * 2-D [[HilbertIndex]] lacks: a 100 TB layout clustered on THREE predicate
  * dimensions (e.g. user × day × magnitude, or lang × time × length) needs
  * a 3-D curve, or the third dimension's envelope degenerates to the full
  * range in every file.
  *
  * Algorithm: Skilling's transpose form of the n-dimensional Hilbert curve
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004) at n = 3,
  * b = 8 — the standard published generalization (the 2-D rotation walk
  * does not extend past two axes; Skilling's inverse-undo + Gray-code pass
  * works for any n). The per-axis transform is 7 rounds of conditional
  * invert/exchange, then a Gray encode and a parity correction, then an
  * MSB-first 3-way bit interleave; every step is integer bit arithmetic,
  * so the DuckDB oracle unrolls the identical rounds in SQL and the full
  * mapping is hash-checked (`q_curve3_skip`). Consecutive indices are
  * grid-adjacent across all 2²⁴ cells (spec walks sampled ranges against a
  * plain-Scala inverse; the b=4 instance is walked exhaustively).
  *
  * Same engineering contract as [[HilbertIndex]]: whole-stage codegen
  * (layout passes evaluate this once per row being rewritten), inputs
  * masked to 8 bits, analysis-time integral-type checking.
  */
case class Hilbert3Index(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsIntegralInputs {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    // Accept any integral width (see HilbertIndex.nullSafeEval).
    var x0 = a.asInstanceOf[Number].longValue & 255L
    var x1 = b.asInstanceOf[Number].longValue & 255L
    var x2 = c.asInstanceOf[Number].longValue & 255L
    // Inverse undo: conditional invert (axis bit set) / exchange-with-axis-0
    // (axis bit clear) of the low bits, per stage Q.
    var q = 128L
    while (q > 1L) {
      val p = q - 1L
      if ((x0 & q) != 0L) x0 ^= p
      if ((x1 & q) != 0L) x0 ^= p
      else { val t = (x0 ^ x1) & p; x0 ^= t; x1 ^= t }
      if ((x2 & q) != 0L) x0 ^= p
      else { val t = (x0 ^ x2) & p; x0 ^= t; x2 ^= t }
      q >>= 1
    }
    // Gray encode + parity correction from the last axis.
    x1 ^= x0
    x2 ^= x1
    var t = 0L
    q = 128L
    while (q > 1L) { if ((x2 & q) != 0L) t ^= q - 1L; q >>= 1 }
    x0 ^= t; x1 ^= t; x2 ^= t
    // MSB-first interleave: bit b of (x0, x1, x2) → index bits 3b+2, 3b+1, 3b.
    var h = 0L
    var bit = 7
    while (bit >= 0) {
      h = (h << 1) | ((x0 >> bit) & 1L)
      h = (h << 1) | ((x1 >> bit) & 1L)
      h = (h << 1) | ((x2 >> bit) & 1L)
      bit -= 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val x0 = ctx.freshName("h3x0")
      val x1 = ctx.freshName("h3x1")
      val x2 = ctx.freshName("h3x2")
      val q = ctx.freshName("h3q")
      val p = ctx.freshName("h3p")
      val t = ctx.freshName("h3t")
      val h = ctx.freshName("h3h")
      val bit = ctx.freshName("h3b")
      s"""
         |long $x0 = $a & 255L;
         |long $x1 = $b & 255L;
         |long $x2 = $c & 255L;
         |for (long $q = 128L; $q > 1L; $q >>= 1) {
         |  final long $p = $q - 1L;
         |  if (($x0 & $q) != 0L) $x0 ^= $p;
         |  if (($x1 & $q) != 0L) { $x0 ^= $p; }
         |  else { long $t = ($x0 ^ $x1) & $p; $x0 ^= $t; $x1 ^= $t; }
         |  if (($x2 & $q) != 0L) { $x0 ^= $p; }
         |  else { long $t = ($x0 ^ $x2) & $p; $x0 ^= $t; $x2 ^= $t; }
         |}
         |$x1 ^= $x0;
         |$x2 ^= $x1;
         |{
         |  long $t = 0L;
         |  for (long $q = 128L; $q > 1L; $q >>= 1)
         |    if (($x2 & $q) != 0L) $t ^= $q - 1L;
         |  $x0 ^= $t; $x1 ^= $t; $x2 ^= $t;
         |}
         |long $h = 0L;
         |for (int $bit = 7; $bit >= 0; $bit--) {
         |  $h = ($h << 1) | (($x0 >> $bit) & 1L);
         |  $h = ($h << 1) | (($x1 >> $bit) & 1L);
         |  $h = ($h << 1) | (($x2 >> $bit) & 1L);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Hilbert3Index =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Hilbert3Index {
  /** Column wrapper over three long grid-coordinate columns (0..255). */
  def apply(x: Column, y: Column, z: Column): Column =
    ColumnBridge.toColumn(Hilbert3Index(
      ColumnBridge.toExpression(x), ColumnBridge.toExpression(y),
      ColumnBridge.toExpression(z)))
}
