package graft.operators

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the layout op behind "cluster the table on (a, b) so a
  * 2-d box predicate prunes most files" (public technique; same idea
  * as Delta Lake's OPTIMIZE ZORDER BY or the classic UB-tree layout).
  *
  * Why it matters at 100 TB: parquet keeps per-file/row-group min-max
  * stats per column. Range-partitioning on ONE column makes only that
  * column's stats tight — a predicate on any other column prunes
  * nothing. Interleaving the bits of several columns into one sort key
  * makes every participating column's stats tight simultaneously
  * (each file covers a small hyper-rectangle of the key space), so a
  * scan planner — Spark's row-group filtering, or any file-stats
  * manifest — can skip everything outside the query box.
  *
  * The z-value is a pure codegen'd column expression (shift/mask/OR
  * tree, no UDF), so the only cost of the layout job is the range
  * exchange + within-partition sort that any clustering write pays.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of the given non-negative
    * integral columns into one BIGINT sort key. Column i contributes
    * bit j to output position `j * n + i` — the standard round-robin
    * bit interleave for n dimensions.
    *
    * `bits` defaults to 20 per dimension (fits 3 dims in a long with
    * room to spare); values above 2^bits-1 are clamped so outliers
    * degrade locality instead of corrupting the curve. Nulls sort
    * first (z-value -1), mirroring NULLS FIRST.
    */
  def zValue(cols: Seq[Column], bits: Int = 20): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} dims × $bits bits exceeds a signed long")
    val n = cols.size
    val maxV = (1L << bits) - 1L
    val clamped = cols.map(c =>
      least(greatest(c.cast("long"), lit(0L)), lit(maxV)))
    val interleaved = (0 until bits).flatMap { j =>
      clamped.zipWithIndex.map { case (c, i) =>
        // bit j of dim i → output bit j*n + i
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_.bitwiseOR(_))
    when(cols.map(_.isNull).reduce(_ || _), lit(-1L)).otherwise(interleaved)
  }

  /** Rewrite `df` clustered on the z-order of `zCols`: one range
    * exchange on the z-value, a within-partition sort, and the key
    * dropped before the write (layout metadata, not data). Returns the
    * writer so the caller picks format/path/table. `numFiles` bounds
    * the output file count (each range partition = one file). */
  def cluster(df: DataFrame, zCols: Seq[String], numFiles: Int,
              bits: Int = 20): DataFrameWriter[Row] = {
    val z = zValue(zCols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
  }
}
