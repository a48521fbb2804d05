package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket an event stream onto a fixed-width
  * grid, materialize the MISSING buckets inside each series' observed
  * span, and forward-fill the last observed aggregate — the step that
  * turns irregular event data into the dense, aligned series every
  * downstream consumer (drift monitors, anomaly scans, forecasters like
  * [[graft.pipelines.SdeForecast]]) assumes.
  *
  * 100 TB shape: one aggregation shuffles (series, bucket) pairs; the grid
  * expansion is a per-series `sequence` + `explode` (bounded by span ÷
  * bucket width — pick the width so that stays sane, it is the row count
  * of the OUTPUT); the forward fill is a window partitioned by series
  * (bounded per-series state, never a global sort). No driver-side
  * collection anywhere.
  */
object TimeSeries {

  /** Dense per-series grid with forward-filled values.
    *
    * Buckets are `floor(epoch_seconds / bucketSeconds)` (engine-portable
    * integer arithmetic). Per (series, bucket): `n_events`, `filled`
    * (1 = materialized gap), and `value_sum` = sum(value) rounded to 2 dp,
    * forward-filled across gaps — rounding happens BEFORE the fill, so a
    * filled row copies an already-deterministic value. Each series' grid
    * spans its own [min, max] observed bucket, so there are no leading
    * nulls to fill. */
  def gapFill(events: DataFrame, series: Column, ts: Column, value: Column,
              bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds > 0: $bucketSeconds")
    val obs = events
      .select(series.as("series_id"),
        floor(ts.cast("long") / lit(bucketSeconds)).cast("long").as("bucket"),
        value.as("__v"))
      .groupBy("series_id", "bucket")
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum(col("__v")), 2).as("__vs"))
    val grid = obs.groupBy("series_id")
      .agg(min("bucket").as("__b0"), max("bucket").as("__b1"))
      .select(col("series_id"),
        explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val w = Window.partitionBy("series_id").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("series_id", "bucket"), "left")
      .select(col("series_id"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_events").isNull, lit(1L)).otherwise(lit(0L)).as("filled"),
        last(col("__vs"), ignoreNulls = true).over(w).as("value_sum"))
  }

  /** Exponentially-weighted moving average over a DENSE per-series grid
    * (what [[gapFill]] produces — the gap fill is exactly what makes the
    * recurrence well-defined: every bucket has a predecessor):
    * y₁ = x₁, yᵢ = α·xᵢ + (1−α)·yᵢ₋₁ — the trailing baseline smoother
    * for drift/anomaly monitors.
    *
    * A window function cannot express the recurrence, so each series folds
    * sequentially inside one task (`flatMapGroups`) — bounded by the grid
    * length ([[gapFill]]'s span ÷ bucket width), the same per-series bound
    * the fill window already carries; series are processed in parallel.
    *
    * Cross-engine determinism: the fold is two products and one sum per
    * step in a fixed order, so for an exactly-representable α (0.5, 0.25,
    * …) the trajectory is bit-identical to a SQL recursive replay with no
    * rounding fence at all. */
  def ewma(grid: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1]: $alpha")
    val spark = grid.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha
    grid.select(col("series_id").cast("long"), col("bucket").cast("long"),
        col("value_sum").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, it) =>
        val rows = it.toArray.sortBy(_._2)
        val out = new Array[(Long, Long, Double, Double)](rows.length)
        var y = 0.0
        var i = 0
        while (i < rows.length) {
          val x = rows(i)._3
          y = if (i == 0) x else alpha * x + beta * y
          out(i) = (sid, rows(i)._2, x, y)
          i += 1
        }
        out.iterator
      }.toDF("series_id", "bucket", "value_sum", "ewma")
  }
}
