package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Zorder

/** Physical write layout — the other half of the `q_zorder_skip` audit:
  * that query MEASURES how much a Z-order layout prunes; this WRITES one.
  *
  * `writeZOrdered` materializes a table clustered by the Morton interleave
  * of two columns: `repartitionByRange` on the Z-value gives each output
  * file a contiguous Z-range (a range exchange — one shuffle, no global
  * sort on the driver), and `sortWithinPartitions` lays rows out Z-ordered
  * inside each file so Parquet row-group min/max envelopes stay tight at
  * sub-file granularity too. At 100 TB this is exactly the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` write shape: the cost is one range shuffle at
  * write time; the payoff is every 2-D-selective read pruning ~√ of what
  * a 1-D sort prunes.
  *
  * The grid bounds are taken as ARGUMENTS (not computed) so an
  * incremental writer appends files under the same grid — recomputing
  * bounds per batch would silently re-grid the table and break envelope
  * comparability across files.
  */
object Layout {

  /** Z-value of two dimension columns on a pinned [lo, hi] grid. */
  def zvalueFor(x: Column, xLo: Long, xHi: Long,
      y: Column, yLo: Long, yHi: Long): Column =
    Zorder.zvalue(
      Zorder.grid8(x, lit(xLo), lit(xHi)),
      Zorder.grid8(y, lit(yLo), lit(yHi)))

  /** Write `df` as `numFiles` Parquet files clustered by the Z-interleave
    * of `xCol` and `yCol`. The helper column never reaches the files.
    */
  def writeZOrdered(df: DataFrame, xCol: String, xLo: Long, xHi: Long,
      yCol: String, yLo: Long, yHi: Long, numFiles: Int, path: String): Unit =
    writeCurveClustered(df,
      zvalueFor(col(xCol), xLo, xHi, col(yCol), yLo, yHi), numFiles, path)

  /** Same write shape clustered by the Hilbert index — the tighter-locality
    * curve (`q_hilbert_skip` measures the difference; `ZorderSpec` proves
    * the adjacency property behind it).
    */
  def writeHilbertOrdered(df: DataFrame, xCol: String, xLo: Long, xHi: Long,
      yCol: String, yLo: Long, yHi: Long, numFiles: Int, path: String): Unit =
    writeCurveClustered(df,
      graft.functions.HilbertIndex(
        Zorder.grid8(col(xCol), lit(xLo), lit(xHi)),
        Zorder.grid8(col(yCol), lit(yLo), lit(yHi))), numFiles, path)

  /** 3-D variants: the same range-exchange write clustered by a 3-D curve
    * — for tables whose queries constrain THREE dimensions (user × day ×
    * magnitude; lang × time × length), where any 2-D layout leaves the
    * third dimension's per-file envelope at the full range.
    * `q_curve3_skip` measures what this buys.
    */
  def writeMorton3Ordered(df: DataFrame, xCol: String, xLo: Long, xHi: Long,
      yCol: String, yLo: Long, yHi: Long, zCol: String, zLo: Long, zHi: Long,
      numFiles: Int, path: String): Unit =
    writeCurveClustered(df, Zorder.zvalue3(
      Zorder.grid8(col(xCol), lit(xLo), lit(xHi)),
      Zorder.grid8(col(yCol), lit(yLo), lit(yHi)),
      Zorder.grid8(col(zCol), lit(zLo), lit(zHi))), numFiles, path)

  def writeHilbert3Ordered(df: DataFrame, xCol: String, xLo: Long, xHi: Long,
      yCol: String, yLo: Long, yHi: Long, zCol: String, zLo: Long, zHi: Long,
      numFiles: Int, path: String): Unit =
    writeCurveClustered(df, graft.functions.Hilbert3Index(
      Zorder.grid8(col(xCol), lit(xLo), lit(xHi)),
      Zorder.grid8(col(yCol), lit(yLo), lit(yHi)),
      Zorder.grid8(col(zCol), lit(zLo), lit(zHi))), numFiles, path)

  /** Append a batch into an existing Z-ordered table under the SAME
    * pinned grid — the incremental half of the layout story the
    * [[graft.ops.Zorder.grid8]] clamp exists for: the batch gets its own
    * range exchange and lands as `numFiles` NEW curve-clustered files;
    * existing files are untouched, so append cost is proportional to the
    * batch, not the table. Out-of-range values (the grid is pinned, the
    * data moved) clamp into the edge cells — they widen the batch's two
    * boundary files instead of shredding every envelope. After many
    * appends the table accumulates small files; [[compactZOrdered]] is
    * the matching maintenance pass.
    */
  def appendZOrdered(df: DataFrame, xCol: String, xLo: Long, xHi: Long,
      yCol: String, yLo: Long, yHi: Long, numFiles: Int, path: String): Unit =
    writeCurveClustered(df,
      zvalueFor(col(xCol), xLo, xHi, col(yCol), yLo, yHi), numFiles, path,
      mode = "append")

  /** Compaction/OPTIMIZE pass: rewrite a (typically append-fragmented)
    * table as `numFiles` Z-clustered files into `destPath` — one scan +
    * one range exchange, the same cost as the original write. The rewrite
    * lands beside the source (atomic swap/commit is a table-format
    * concern); readers move to `destPath` when it is complete. Restores
    * both the file count and the envelope tightness appends eroded.
    */
  def compactZOrdered(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, xCol: String, xLo: Long, xHi: Long,
      yCol: String, yLo: Long, yHi: Long, numFiles: Int,
      destPath: String): Unit =
    writeZOrdered(spark.read.parquet(srcPath), xCol, xLo, xHi,
      yCol, yLo, yHi, numFiles, destPath)

  private def writeCurveClustered(df: DataFrame, curve: Column,
      numFiles: Int, path: String, mode: String = "overwrite"): Unit =
    df.withColumn("__cv", curve)
      .repartitionByRange(numFiles, col("__cv"))
      .sortWithinPartitions("__cv")
      .drop("__cv")
      .write.mode(mode).parquet(path)

  /** 1-D comparison layout: same writer, range-clustered on one column. */
  def writeRangeSorted(df: DataFrame, sortCol: String, numFiles: Int,
      path: String): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max envelopes of `cols` for a written table — the
    * pruning statistics a lake format's manifest would carry; reads ONLY
    * file metadata plus the envelope columns.
    */
  def fileEnvelopes(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(count(lit(1)).as("rows"), aggs: _*)
  }
}
