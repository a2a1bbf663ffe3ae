package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity of two SORTED, DISTINCT string arrays via a single
  * merge-walk — `|A∩B| / (|A|+|B|-|A∩B|)` with no per-pair hash-set or array
  * allocation, unlike `array_intersect`+`array_union` which build two hash
  * maps per invocation.
  *
  * Why a custom Catalyst expression (SURVEY.md §4 "custom only where
  * built-ins fall short"): the all-pairs n-gram Jaccard dedup
  * (`q_dedup_jaccard`, reference capability per the LLM-pipeline north star)
  * evaluates this on O(block²) pairs — millions of calls whose cost is pure
  * per-call overhead. The merge-walk participates in whole-stage codegen
  * (`doGenCode` below), so the pair scan stays in one generated loop.
  *
  * Precondition: both inputs sorted ascending by Spark's binary UTF8String
  * ordering (`sort_array(array_distinct(...))` produces exactly that) and
  * duplicate-free. Callers own the precondition; results are undefined
  * otherwise. Both-empty input is defined as 1.0 (identical empties).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<string> or array<bigint> (enforced by the Column
  // wrapper's callers; ExpectsInputTypes is private[sql] in Spark 4, so the
  // precondition is documented rather than analyzer-checked). The long
  // variant exists for pre-hashed token sets: one 60-bit md5-derived long
  // per token makes each merge-walk step a primitive compare instead of a
  // byte-wise string compare — and because the oracle hashes with the SAME
  // md5 construction, results agree by construction even under collisions.
  private def elemIsLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val longs = elemIsLong
    var i = 0; var j = 0; var common = 0
    while (i < n && j < m) {
      val c =
        if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { common += 1; i += 1; j += 1 }
    }
    val union = n + m - common
    if (union == 0) 1.0 else common.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val common = ctx.freshName("common"); val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      val cmp =
        if (elemIsLong) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $common = 0;
         |while ($i < $n && $j < $m) {
         |  final int $c = $cmp;
         |  if ($c < 0) { $i++; } else if ($c > 0) { $j++; }
         |  else { $common++; $i++; $j++; }
         |}
         |final int $union = $n + $m - $common;
         |${ev.value} = ($union == 0) ? 1.0 : (double) $common / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

object JaccardSorted {
  /** Column wrapper: `jaccardSorted(sortedDistinctA, sortedDistinctB)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(JaccardSorted(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
