package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's deterministic parquet testdata (TESTDATA.md).
  *
  * The reference loads CSV/JSON row files with per-column coercion
  * (reference: src/spark/training.py:37-57,113-116,130-133,145); the engine
  * standardizes on columnar Parquet scans so Catalyst gets column pruning and
  * predicate pushdown for free. CSV/JSON ingest is kept as a capability in
  * [[graft.sources.Ingest]].
  *
  * Role mapping onto the reference's domain (SURVEY.md §7.2):
  * part≈tracks, customer≈users, orders+lineitem≈interactions,
  * nation/region≈dimension enrichment, events≈interaction stream,
  * documents/embeddings≈LLM-pipeline extension fixtures.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw longs and
    * truncate to microsecond timestamps with integer `div` — the exact same
    * truncation DuckDB applies when it reads the file, so event-time queries
    * stay oracle-comparable. (Double division would lose precision: epoch
    * nanos ~1.7e18 exceeds the 53-bit double mantissa.)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
