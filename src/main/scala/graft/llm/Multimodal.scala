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

  /** Resize output: the resized payload travels WITH its typed metadata —
    * binary in, binary out, scalars alongside (the shape a real thumbnail
    * stage has).
    */
  final case class Resized(
      doc_id: Long, resized: Array[Byte], resized_bytes: Long,
      scale_x: Double, scale_y: Double)

  /** Resize a binary "image" to `targetW`×`targetH`. STUB resize: the
    * payload is truncated to the target pixel budget and scale factors are
    * derived from the stub decode's dimensions; a production build swaps
    * the partition body for the real scaler. One-in/one-out map, binary
    * column preserved end-to-end, no driver transfer.
    */
  def resize(spark: SparkSession, payloads: DataFrame,
      targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    val budget = targetW * targetH
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val out = bytes.take(budget)
          // half-up (not rint's half-even): matches SQL round() on the
          // always-positive scale factors, e.g. 250/64 = 3.90625 → 3.9063
          val r4 = (x: Double) => math.floor(x * 1e4 + 0.5) / 1e4
          Resized(id, out, out.length.toLong,
            r4((n % 640).toDouble / targetW), r4((n % 480).toDouble / targetH))
        }
      }
      .toDF()
  }

  /** A 60-bit perceptual hash of one payload. */
  final case class PHash(doc_id: Long, phash: Long)

  /** Perceptual hash over a binary payload — the media twin of the text
    * path's SimHash: 60 equal byte-blocks, bit j set iff block j's byte
    * sum exceeds the payload mean (the aHash structure real image dedup
    * uses over downscaled luma blocks). STUB decode like the rest of this
    * module: a production build decodes to luma first and hashes that;
    * the banding/matching machinery downstream is unchanged. 60 bits, not
    * 64, so the hash never sets the sign bit and band extraction works in
    * plain positive arithmetic on every engine.
    */
  def pHash(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val nb = bytes.length
          val sums = new Array[Long](60)
          var p = 0
          while (p < nb) {
            sums((p.toLong * 60 / nb).toInt) += bytes(p) & 0xff
            p += 1
          }
          val total = sums.sum
          var h = 0L
          var j = 0
          while (j < 60) {
            if (sums(j) * 60 > total) h |= 1L << j
            j += 1
          }
          PHash(id, h)
        }
      }
      .toDF()
  }

  /** One sampled "video frame" with its position and a content feature. */
  final case class Frame(doc_id: Long, frame_idx: Long, head_byte: Long)

  /** Sample every `everyN`-th fixed-size frame from a binary "video" — the
    * one-to-many decode shape (flatMap inside mapPartitions): a 2-hour
    * clip explodes into thousands of frame rows without ever leaving the
    * executor. STUB decode: frames are contiguous `frameBytes`-byte spans;
    * the per-frame feature is its first byte.
    */
  def frameSample(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int, everyN: Int): DataFrame = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames).iterator
            .filter(_ % everyN == 0)
            .map(f => Frame(id, f.toLong, (bytes(f * frameBytes) & 0xff).toLong))
        }
      }
      .toDF()
  }
}
