package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * min/max-statistics pruning. A 100 TB table sorted on ONE column is
  * prunable on that column only; interleaving the bits of d grid
  * coordinates (bit i of column j → output bit `i·d + j`) gives a single
  * sort key under which records close in EVERY dimension land in the same
  * files, so per-file min/max stats prune multi-column range predicates
  * too (the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`;
  * z-curves are public knowledge going back to Morton 1966).
  *
  * The z-value is composed from BUILT-IN bitwise expressions (shift, and,
  * or) — `d·bits` codegen'd terms collapsed into one projection; no UDF,
  * no custom expression needed, and the identical arithmetic replays in
  * the q63 DuckDB oracle. */
object Layout {

  /** Morton interleave of non-negative integer grid coordinates (each
    * masked to `bits` low bits; `d·bits ≤ 63`). Scale continuous columns
    * to grid cells first — see [[gridCell]]. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 1 && bits >= 1 && d * bits <= 63, "need 1+ cols, d*bits <= 63")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Scale a continuous value in [lo, hi] onto the 2^bits grid (clamped —
    * out-of-domain values land on the edge cells). */
  def gridCell(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    least(greatest(floor((c - lit(lo)) / lit(hi - lo) * lit(cells)), lit(0.0)),
      lit(cells - 1)).cast("long")
  }

  /** Cluster a table for multi-dim pruning: range-partition + sort by the
    * z-value, so each output file covers a compact z-range and min/max
    * file statistics become a 2-D (or d-D) index. Write the result with
    * the z column retained to keep the stats actionable. */
  def clusterByZ(df: DataFrame, cols: Seq[Column], bits: Int,
                 partitions: Int = 32): DataFrame = {
    val z = zValue(cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
  }
}
