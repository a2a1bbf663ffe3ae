package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two double arrays as one codegen'd index loop.
  *
  * Why a custom Catalyst expression (SURVEY.md §4 "custom only where
  * built-ins fall short"): the higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is CodegenFallback — every
  * evaluation interprets two lambda closures and materializes the zipped
  * intermediate array. That overhead multiplies on the pair-heavy embedding
  * paths (`q_dedup_embed`'s blocked pairs, `q_embed_cosine_topk`'s
  * query×corpus scoring, IVF probing) where this is the innermost loop.
  * The loop below participates in whole-stage codegen: no closures, no
  * intermediate array, one multiply-add per element.
  *
  * Summation is the SAME sequential left-to-right fold as the HOF
  * formulation and as DuckDB's `list_dot_product`, so oracle-checked
  * results are bit-identical to both.
  *
  * Precondition: equal-length `array<double>` inputs with no null elements
  * (embedding columns by construction); the walk stops at the shorter
  * length, so ragged inputs yield the prefix product rather than an error.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column wrapper: `DotProduct(a, b)` over `array<double>` columns. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProduct(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
