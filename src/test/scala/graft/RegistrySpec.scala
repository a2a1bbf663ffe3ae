package graft

import graft.queries.Registry

/** Contract invariants the Verify/Bench driver depends on. */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicates: ${names.diff(names.distinct).distinct}")
  }

  test("every oracle key has a query") {
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("SparkEntry exposes the registry") {
    assert(SparkEntry.queries.keySet === Registry.queries.keySet)
    assert(SparkEntry.oracleSql === Registry.oracleSql)
  }

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows (driver rows>0 contract)") {
    Registry.all.foreach { e =>
      val df = e.q(spark, sfDir)
      assert(df.columns.nonEmpty, s"${e.name} has no columns")
      assert(df.count() > 0, s"${e.name} returned no rows")
    }
  }

  test("no query returns a column type the driver's hash compare can't sort") {
    // The driver sorts every output column with pandas before hashing —
    // array/map/struct cells raise TypeError there (round-3 lesson:
    // ml_feature_pipeline). Only atomic types may reach Verify output.
    import org.apache.spark.sql.types._
    Registry.all.foreach { e =>
      e.q(spark, sfDir).schema.fields.foreach { f =>
        assert(
          !f.dataType.isInstanceOf[ArrayType] &&
            !f.dataType.isInstanceOf[MapType] &&
            !f.dataType.isInstanceOf[StructType],
          s"${e.name}.${f.name} is ${f.dataType.simpleString} — unhashable by the driver")
      }
    }
  }
}
