package graft

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Pins the events-table nanos→micros read path. The fixture stores
  * TIMESTAMP(NANOS); the Spark 4.1.2 reader surfaces it as TIMESTAMP_NTZ
  * truncated to micros and [[Tables.events]] casts to a session-UTC
  * timestamp. The DuckDB oracle truncates the same file the same way, so
  * these constants are DuckDB's own `epoch_us(ts)` answers on sf0.001 —
  * if a future jar changes the truncation (round instead of floor, or a
  * revived raw-long mode), every event-time oracle would drift; this
  * spec makes that failure loud and local.
  */
class EventsSpec extends SparkSpec {

  test("events.ts reads as a plain timestamp with DuckDB's exact micros") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val r = ev.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
      sum(unix_micros(col("ts")))).collect()(0)
    // DuckDB: SELECT min(epoch_us(ts)), max(epoch_us(ts)),
    //                sum(epoch_us(ts)) FROM 'sf0.001/events.parquet'
    assert(r.getLong(0) === 1704067798778549L)
    assert(r.getLong(1) === 1706657176220708L)
    assert(r.getLong(2) === 1705320648565608007L)
  }
}
