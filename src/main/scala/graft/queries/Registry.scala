package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry of named queries exposed through [[graft.SparkEntry]].
  *
  * Each entry pairs a Spark query (pure `(SparkSession, sfDir) => DataFrame`)
  * with an optional DuckDB-oracle SQL twin over the same parquet tables.
  * Entries without an oracle (ML / streaming / LSH ops that ANSI SQL can't
  * express) get the driver's weaker rows-only check.
  *
  * Determinism contract (required by the driver's hash compare):
  *   - every query ends in an explicit total ORDER BY (tiebreakers included),
  *   - float aggregates go through integer cents (see [[Num]]) so the result
  *     is independent of partition-level summation order,
  *   - all randomness is seeded, all timestamps come from the fixtures.
  */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  final case class Entry(name: String, q: Q, oracle: Option[String])

  def all: Seq[Entry] =
    Relational.entries ++ Aggregates.entries ++ Stats.entries ++
      Windows.entries ++ Scalars.entries ++ MLQueries.entries ++
      LlmQueries.entries ++ ScaleQueries.entries ++
      StreamingQueries.entries ++ RecQueries.entries ++
      Warehouse.entries ++ GraphQueries.entries ++ Analytics.entries

  def queries: Map[String, Q] = all.map(e => e.name -> e.q).toMap
  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
