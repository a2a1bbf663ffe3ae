package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Hashing, Num}
import graft.tables.Tables
import Registry.{Entry, Q}

/** Scalar-function surface: SURVEY.md §2.6 (F1-F15).
  *
  * Everything here is pure Catalyst built-ins — no UDFs — so the whole
  * query stays inside whole-stage codegen (the reference implements all of
  * these driver-side in Python; re-expressing them as expressions is what
  * makes them distributable at all). Randomness is replaced by md5-derived
  * values ([[graft.ops.Hashing]]) so every query has an exact DuckDB twin.
  */
object Scalars {

  /** F1/F2 — rule-based classification via when-chains: the reference's
    * valence/energy emotion rules (src/data_processor.py:164-186) and
    * popularity→rating bucketization (src/spark/training.py:452-458).
    */
  private val whenChain: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        when(col("p_retailprice") > 1800, lit(5.0))
          .when(col("p_retailprice") > 1500, lit(4.0))
          .when(col("p_retailprice") > 1200, lit(3.0))
          .when(col("p_retailprice") > 950, lit(2.0))
          .otherwise(lit(1.0)).as("rating"),
        when(col("p_size") > 40 && col("p_type") === "PROMO", lit("energetic"))
          .when(col("p_size") > 40, lit("intense"))
          .when(col("p_size") > 15, lit("balanced"))
          .when(col("p_type") === "ECONOMY", lit("calm"))
          .otherwise(lit("neutral")).as("label"))
      .orderBy("p_partkey")

  private val whenChainSql =
    """SELECT p_partkey,
      |       CASE WHEN p_retailprice > 1800 THEN CAST(5.0 AS DOUBLE)
      |            WHEN p_retailprice > 1500 THEN 4.0
      |            WHEN p_retailprice > 1200 THEN 3.0
      |            WHEN p_retailprice > 950 THEN 2.0
      |            ELSE 1.0 END AS rating,
      |       CASE WHEN p_size > 40 AND p_type = 'PROMO' THEN 'energetic'
      |            WHEN p_size > 40 THEN 'intense'
      |            WHEN p_size > 15 THEN 'balanced'
      |            WHEN p_type = 'ECONOMY' THEN 'calm'
      |            ELSE 'neutral' END AS label
      |FROM part ORDER BY p_partkey""".stripMargin

  /** F7 — deterministic hash → attribute pick: `md5(id)[:8]` as int, modulo
    * into literal pools (reference: src/app_optimized.py:259-277,334-366).
    */
  private val hashAttrs: Q = (s, d) => {
    val h = Hashing.md5Long(col("p_name"))
    val bucket = pmod(h, lit(5L))
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        h.as("h"),
        bucket.as("bucket"),
        element_at(
          array(lit("happy"), lit("sad"), lit("energetic"), lit("calm"), lit("neutral")),
          (bucket + lit(1)).cast("int")).as("mood"))
      .orderBy("p_partkey")
  }

  private val hashAttrsSql =
    """SELECT p_partkey,
      |       ('0x' || substr(md5(p_name), 1, 8))::BIGINT AS h,
      |       ('0x' || substr(md5(p_name), 1, 8))::BIGINT % 5 AS bucket,
      |       (['happy','sad','energetic','calm','neutral'])[(('0x' || substr(md5(p_name), 1, 8))::BIGINT % 5) + 1] AS mood
      |FROM part ORDER BY p_partkey""".stripMargin

  /** F5/F6 — ms→"m:ss" duration formatting and URL synthesis
    * (reference: src/data_processor.py:192-205).
    */
  private val formatFuncs: Q = (s, d) => {
    val ms = round(col("p_retailprice") * 1000).cast("long")
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        concat(
          floor(ms / 60000).cast("long").cast("string"), lit(":"),
          lpad(floor(pmod(ms, lit(60000)) / 1000).cast("long").cast("string"), 2, "0"))
          .as("duration"),
        concat(lit("https://example.com/part/"), col("p_partkey")).as("url"))
      .orderBy("p_partkey")
  }

  private val formatFuncsSql =
    """SELECT p_partkey,
      |       CAST(CAST(floor(ms / 60000) AS BIGINT) AS VARCHAR) || ':' ||
      |         lpad(CAST(CAST(floor((ms % 60000) / 1000) AS BIGINT) AS VARCHAR), 2, '0') AS duration,
      |       'https://example.com/part/' || CAST(p_partkey AS VARCHAR) AS url
      |FROM (SELECT p_partkey, CAST(round(p_retailprice * 1000) AS BIGINT) AS ms FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** F11/F12 — timestamp parts: year/month/day-of-week extraction and
    * string formatting (reference: src/streaming_service.py:295-296;
    * src/streamlit_app.py:644,670). Spark dayofweek is 1=Sunday; the DuckDB
    * twin adjusts its 0=Sunday `dow` by +1.
    */
  private val tsExtract: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        year(col("o_orderdate")).as("y"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("dstr"))
      .groupBy("y", "dow")
      .agg(count(lit(1)).as("cnt"), min("dstr").as("first_day"))
      .orderBy("y", "dow")

  private val tsExtractSql =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
      |       CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS dow,
      |       count(*) AS cnt,
      |       min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day
      |FROM orders GROUP BY y, dow ORDER BY y, dow""".stripMargin

  /** F8/F13 — case/whitespace normalization + text-feature concat
    * (reference: src/data_processor.py:140-141; src/training_service.py:609-610).
    */
  private val stringNorm: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        concat(lower(trim(col("c_name"))), lit("|"), lower(col("c_mktsegment"))).as("match_key"),
        concat_ws(" ", lower(col("c_mktsegment")), col("c_name")).as("text_features"))
      .orderBy("c_custkey")

  private val stringNormSql =
    """SELECT c_custkey,
      |       lower(trim(c_name)) || '|' || lower(c_mktsegment) AS match_key,
      |       concat_ws(' ', lower(c_mktsegment), c_name) AS text_features
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** F14 — weighted categorical sampling by inverse-CDF over a
    * deterministic uniform (reference picks actions with rating-dependent
    * weights from unseeded random, src/streaming_service.py:246-257; the
    * engine's md5-uniform makes it reproducible AND oracle-checkable).
    */
  private val weightedAction: Q = (s, d) => {
    val rating = greatest(lit(1.0), least(lit(5.0), col("value") / lit(40.0)))
    val u = Hashing.md5Frac(col("event_id").cast("string"))
    val hi = rating >= 4.0
    Tables.events(s, d)
      .withColumn(
        "action",
        when(hi && u < 0.7, lit("play"))
          .when(hi && u < 0.9, lit("like"))
          .when(hi, lit("skip"))
          .when(!hi && u < 0.4, lit("play"))
          .when(!hi && u < 0.6, lit("like"))
          .otherwise(lit("skip")))
      .groupBy("action")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("action")
  }

  private val weightedActionSql =
    """WITH x AS (
      |  SELECT greatest(CAST(1.0 AS DOUBLE), least(CAST(5.0 AS DOUBLE), value / 40.0)) >= 4.0 AS hi,
      |         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT / CAST(4294967296 AS DOUBLE) AS u
      |  FROM events)
      |SELECT CASE WHEN hi AND u < 0.7 THEN 'play'
      |            WHEN hi AND u < 0.9 THEN 'like'
      |            WHEN hi THEN 'skip'
      |            WHEN NOT hi AND u < 0.4 THEN 'play'
      |            WHEN NOT hi AND u < 0.6 THEN 'like'
      |            ELSE 'skip' END AS action,
      |       count(*) AS cnt
      |FROM x GROUP BY action ORDER BY action""".stripMargin

  /** M9/F2/F3/F4 — the synthetic-interaction generator as a deterministic
    * expression query: hash-popularity → rating buckets, hash-user
    * assignment, hash-jitter (reference: src/spark/training.py:444-461 with
    * seeded rand; md5 here so DuckDB reproduces it exactly).
    */
  private val ratingSynth: Q = (s, d) => {
    val pop = pmod(Hashing.md5Long(col("p_name")), lit(101L))
    val rating = when(pop > 70, lit(5.0)).when(pop > 50, lit(4.0))
      .when(pop > 30, lit(3.0)).when(pop > 10, lit(2.0)).otherwise(lit(1.0))
    val user = pmod(Hashing.md5Long(col("p_partkey").cast("string")), lit(1000L))
    val jit = Hashing.md5Frac(concat(col("p_partkey").cast("string"), lit("j"))) - lit(0.5)
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        pop.as("popularity"),
        user.as("user_id"),
        rating.as("rating"),
        Num.roundAt(greatest(lit(0.5), least(lit(5.5), rating + jit)), 3).as("noisy_rating"))
      .orderBy("p_partkey")
  }

  private val ratingSynthSql =
    """WITH x AS (
      |  SELECT p_partkey,
      |         ('0x' || substr(md5(p_name), 1, 8))::BIGINT % 101 AS popularity,
      |         ('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % 1000 AS user_id,
      |         ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || 'j'), 1, 8))::BIGINT / CAST(4294967296 AS DOUBLE) - 0.5 AS jit
      |  FROM part),
      |y AS (
      |  SELECT p_partkey, popularity, user_id, jit,
      |         CASE WHEN popularity > 70 THEN CAST(5.0 AS DOUBLE)
      |              WHEN popularity > 50 THEN 4.0
      |              WHEN popularity > 30 THEN 3.0
      |              WHEN popularity > 10 THEN 2.0
      |              ELSE 1.0 END AS rating
      |  FROM x)
      |SELECT p_partkey, popularity, user_id, rating,
      |       floor((greatest(CAST(0.5 AS DOUBLE), least(CAST(5.5 AS DOUBLE), rating + jit))) * 1000 + 0.5) / 1000.0 AS noisy_rating
      |FROM y ORDER BY p_partkey""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q_when_chain", whenChain, Some(whenChainSql)),
    Entry("q_hash_attrs", hashAttrs, Some(hashAttrsSql)),
    Entry("q_format_funcs", formatFuncs, Some(formatFuncsSql)),
    Entry("q_ts_extract", tsExtract, Some(tsExtractSql)),
    Entry("q_string_norm", stringNorm, Some(stringNormSql)),
    Entry("q_weighted_action", weightedAction, Some(weightedActionSql)),
    Entry("q_rating_synth", ratingSynth, Some(ratingSynthSql)),
  )
}
