package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-derived values, shared by queries and their DuckDB
  * oracle twins.
  *
  * The reference derives attributes from hashes in two ways: `md5(id)[:8]`
  * parsed as an int (reference: src/app_optimized.py:259-277) and Python's
  * process-seeded `hash()` (reference: src/streamlit_app.py:97) — the latter
  * is not reproducible across runs, so the engine standardizes on md5
  * (SURVEY.md §2.6 F7). md5 of the same UTF-8 string is identical in Spark
  * and DuckDB, which makes every hash-derived query oracle-checkable.
  */
object Hashing {

  /** First 8 hex chars of md5 as a non-negative long in [0, 2^32).
    * DuckDB twin: `('0x' || substr(md5(x), 1, 8))::BIGINT`.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** First 15 hex chars of md5 as a non-negative long in [0, 2^60) — a
    * collision-negligible token fingerprint for hashed-set similarity
    * (the merge-walk in [[graft.functions.JaccardSorted]] compares these as
    * primitive longs). DuckDB twin: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic uniform fraction in [0, 1) — the engine's seeded stand-in
    * for the reference's unseeded `random.random()`
    * (reference: src/streaming_service.py:236-266).
    * DuckDB twin: `(('0x' || substr(md5(x),1,8))::BIGINT) / 4294967296.0`.
    */
  def md5Frac(c: Column): Column = md5Long(c) / lit(4294967296.0)
}
