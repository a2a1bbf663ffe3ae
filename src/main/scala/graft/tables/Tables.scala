package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's deterministic parquet testdata (TESTDATA.md).
  *
  * The reference loads CSV/JSON row files with per-column coercion
  * (reference: src/spark/training.py:37-57,113-116,130-133,145); the engine
  * standardizes on columnar Parquet scans so Catalyst gets column pruning and
  * predicate pushdown for free. CSV/JSON ingest is kept as a capability in
  * [[graft.ops.Ingest]].
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
  def events(s: SparkSession, d: String): DataFrame = read(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
