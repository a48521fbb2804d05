package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window time-series featurization (SURVEY.md W1): each output row
  * pairs `hist` = the `history` values starting at a row with `target` = the
  * `pred` values `horizon` after the history ends — the reference's
  * window loop at `SDE_forecast_ActiveSampling.py:57-71`
  * (history=10, horizon=0, pred=5, stride=1 → n-history-pred+1 windows).
  */
object SlidingWindows {

  /** Featurize over a globally-ordered series. `Window.orderBy` without
    * partitioning is a single task — correct at fixture scale; use
    * [[featurizeByIndex]] when a dense index column exists. */
  def featurize(df: DataFrame, order: Column, value: Column,
                history: Int, pred: Int, horizon: Int = 0, stride: Int = 1): DataFrame = {
    val w = Window.orderBy(col("__ord"))
    val histW = w.rowsBetween(Window.currentRow, history - 1)
    val predW = w.rowsBetween(history + horizon, history + horizon + pred - 1)
    df.select(order.as("__ord"), value.cast("double").as("__v"))
      .withColumn("win_id", row_number().over(w) - 1)
      .withColumn("hist", collect_list("__v").over(histW))
      .withColumn("target", collect_list("__v").over(predW))
      .filter(size(col("hist")) === history && size(col("target")) === pred)
      .filter(col("win_id") % stride === 0)
      .select(col("win_id").cast("long"), col("hist"), col("target"))
  }

  /** Scalable featurization over a series that carries a dense 0-based index
    * (e.g. a pre-assigned row number or `events.event_id`). Fully parallel:
    * rows are range-blocked by index, each block also receives a copy of the
    * next block's first `history+horizon+pred-1` rows (the seam), windows are
    * built inside each block, and a window is kept only by the block that
    * owns its start index — every window exactly once, no global sort, one
    * explode + one hash shuffle regardless of series length. This is the
    * shape that survives 100 TB; `featurize` is the single-task fallback.
    */
  def featurizeByIndex(df: DataFrame, index: Column, value: Column,
                       history: Int, pred: Int, horizon: Int = 0, stride: Int = 1,
                       blockSize: Int = 65536): DataFrame = {
    val span = history + horizon + pred
    require(blockSize > span, s"blockSize must exceed window span $span")
    val base = df.select(index.cast("long").as("__idx"), value.cast("double").as("__v"))
    // integral division (exact on longs; Column./ would go through double)
    val homeBlock = expr(s"__idx DIV $blockSize")
    // Seam rows (offset < span-1 within their block) also feed the previous
    // block's trailing windows.
    val blocks = when(col("__idx") % blockSize < span - 1 && homeBlock > 0,
        array(homeBlock, homeBlock - 1)).otherwise(array(homeBlock))
    val exploded = base.withColumn("__blk", explode(blocks))
    val w = Window.partitionBy("__blk").orderBy("__idx")
    val histW = w.rowsBetween(Window.currentRow, history - 1)
    val predW = w.rowsBetween(history + horizon, history + horizon + pred - 1)
    exploded
      .withColumn("hist", collect_list("__v").over(histW))
      .withColumn("target", collect_list("__v").over(predW))
      // keep each window once: its start row's home block must own it
      .filter(expr(s"__idx DIV $blockSize") === col("__blk"))
      .filter(size(col("hist")) === history && size(col("target")) === pred)
      .filter(col("__idx") % stride === 0)
      .select(col("__idx").as("win_id"), col("hist"), col("target"))
  }
}
