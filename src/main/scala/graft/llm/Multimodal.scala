package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (SURVEY.md §7.2 step 5 / the LLM-pipeline north star).
  *
  * The decode step is STUBBED — this container has no image/audio codecs —
  * with a deterministic byte-level feature extractor, so the Spark-side
  * plumbing (binary transport, schema, partition-parallel batch iteration,
  * no driver collect) is real and testable. A production deployment swaps
  * the body of the partition loop for the actual codec; nothing else
  * changes. `mapPartitions` is the JVM twin of PySpark's `mapInPandas`:
  * one iterator per partition, amortized per-batch setup, output schema
  * fixed by the case-class encoder.
  */
object Multimodal {

  /** Typed metadata emitted per decoded payload. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, head_sum: Long)

  /** Decode a `(doc_id, payload: binary)` frame into typed media features.
    * STUB decode: dimensions are derived from payload length, the "content
    * feature" is the sum of the first 8 bytes — deterministic, so the DuckDB
    * oracle can verify the plumbing end-to-end.
    */
  def decodeFeatures(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Per-partition setup would init the codec once here (not per row).
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val head = bytes.take(8).map(b => (b & 0xff).toLong).sum
          MediaFeatures(id, n, n % 640, n % 480, head)
        }
      }
      .toDF()
  }
}
