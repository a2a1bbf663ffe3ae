package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** [[graft.functions.DotProduct]] (custom codegen expression) must agree
  * bit-for-bit with the higher-order-function formulation it replaced —
  * same sequential left-to-right fold — on real embedding data and edges.
  */
class DotProductSpec extends SparkSpec {

  test("codegen dot equals the HOF aggregate(zip_with) fold on embeddings") {
    val e = graft.tables.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.crossJoin(
        e.select(col("vec_id").as("id2"), col("v").as("v2")).limit(5))
      .select(
        DotProduct(col("v"), col("v2")).as("fast"),
        aggregate(zip_with(col("v"), col("v2"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(pairs.filter(col("fast") =!= col("hof")).count() === 0,
      "codegen loop must be bit-identical to the sequential HOF fold")
  }

  test("dot_product is SQL-callable via GraftExtensions") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d"
    ).collect().head.getDouble(0)
    assert(r === 32.0)
  }

  test("edge cases: empty arrays, ragged prefix walk, null propagation") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(array() AS array<double>), CAST(array() AS array<double>)),
        |  (array(2.0d, 3.0d), array(10.0d)),
        |  (CAST(NULL AS array<double>), array(1.0d))
        |AS t(x, y)""".stripMargin)
      .select(DotProduct(col("x"), col("y")).as("d"))
    val out = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) === 0.0)
    assert(out(1) === 20.0, "ragged inputs walk the shorter prefix")
    assert(out(2) === null, "null input propagates null")
  }
}
