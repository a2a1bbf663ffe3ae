package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]], as one codegen'd
  * call — the scan-side half of a broadcast-sketch semi-join.
  *
  * Why (SURVEY.md §4 "custom only where built-ins fall short"): Spark's own
  * runtime bloom filters (`BloomFilterAggregate` / `BloomFilterMightContain`)
  * are internal expressions that only the `InjectRuntimeFilter` rule may
  * plant, and `DataFrameStatFunctions.bloomFilter` returns a driver-side
  * sketch with no public Column-level probe (the usual escape hatch is a
  * Scala UDF — interpreted, off-policy here). This expression closes that
  * gap: build the sketch once over the small-but-too-big-to-broadcast-as-a-
  * hash-table side, then probe it inside whole-stage codegen on the big
  * side. At 100 TB the catalog sketch is a few hundred MB for billions of
  * fingerprints at 3 % fpp — shippable in the task binary where a hash
  * relation is not — and every BF-negative row (the vast majority of a
  * mostly-novel snapshot) skips the shuffle entirely; only BF-positive rows
  * reach the exact verification join.
  *
  * Hash contract: probes `mightContainBinary(utf8.getBytes)` — the exact
  * bytes `DataFrameStatFunctions.bloomFilter` feeds to `putBinary` when
  * building over a string column, so the no-false-negative guarantee holds
  * (BloomSpec proves it over the full fixture catalog).
  *
  * The filter rides along as a codegen reference object (serialized once
  * per task binary, like a broadcast), so evaluation is a direct method
  * call on the deserialized sketch — no closure, no boxing.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  // Fail at analysis time with the expression named, not mid-job with a
  // ClassCastException / Janino error on getBytes().
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BloomMightContain expects a string fingerprint column, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column wrapper: probe a string column against `filter`. */
  def apply(c: Column, filter: BloomFilter): Column =
    ColumnBridge.toColumn(BloomMightContain(ColumnBridge.toExpression(c), filter))
}
