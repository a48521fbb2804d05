package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // ts in epoch seconds; bucketSeconds = 10 → buckets are ts / 10
  private def events = Seq(
    (1L, 5L, 1.0), (1L, 7L, 2.0),     // series 1, bucket 0: n=2, sum=3.0
    (1L, 35L, 4.0),                   // series 1, bucket 3 (gap at 1, 2)
    (2L, 12L, 7.5)                    // series 2, single bucket 1
  ).toDF("series_id", "es", "value")
    .select(col("series_id"), col("es").cast("timestamp").as("ts"), col("value"))

  test("gaps are materialized and forward-filled from the last observation") {
    val out = TimeSeries.gapFill(events, col("series_id"), col("ts"),
        col("value"), bucketSeconds = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out == Map(
      (1L, 0L) -> ((2L, 0L, 3.0)),
      (1L, 1L) -> ((0L, 1L, 3.0)),   // filled, carries bucket-0 sum
      (1L, 2L) -> ((0L, 1L, 3.0)),
      (1L, 3L) -> ((1L, 0L, 4.0)),
      (2L, 1L) -> ((1L, 0L, 7.5))))  // span is per-series: no buckets 0/2+
  }

  test("no gaps means no filled rows and sums match a direct aggregation") {
    val dense = Seq((9L, 1L, 1.5), (9L, 11L, 2.5), (9L, 21L, 3.5))
      .toDF("series_id", "es", "value")
      .select(col("series_id"), col("es").cast("timestamp").as("ts"), col("value"))
    val out = TimeSeries.gapFill(dense, col("series_id"), col("ts"),
        col("value"), bucketSeconds = 10L).collect()
    assert(out.length == 3 && out.forall(_.getLong(3) == 0L))
  }

  test("ewma folds the closed-form recurrence per series") {
    val grid = Seq(
      (1L, 0L, 4.0), (1L, 1L, 8.0), (1L, 2L, 2.0),
      (2L, 5L, 10.0))
      .toDF("series_id", "bucket", "value_sum")
    val out = TimeSeries.ewma(grid, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out == Map(
      (1L, 0L) -> 4.0,            // y1 = x1
      (1L, 1L) -> 6.0,            // .5*8 + .5*4
      (1L, 2L) -> 4.0,            // .5*2 + .5*6
      (2L, 5L) -> 10.0))
  }

  test("ewma over a gap-filled grid carries through filled buckets") {
    val out = TimeSeries.ewma(
        TimeSeries.gapFill(events, col("series_id"), col("ts"), col("value"), 10L),
        alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // series 1 grid x = [3.0, 3.0, 3.0, 4.0] (buckets 1,2 filled with 3.0)
    assert(out((1L, 0L)) == 3.0 && out((1L, 1L)) == 3.0 && out((1L, 2L)) == 3.0)
    assert(out((1L, 3L)) == 3.5)  // .5*4 + .5*3
  }

  test("deterministic under repartitioning") {
    val a = TimeSeries.gapFill(events, col("series_id"), col("ts"),
      col("value"), 10L).collect().map(_.toSeq).toSet
    val b = TimeSeries.gapFill(events.repartition(11), col("series_id"),
      col("ts"), col("value"), 10L).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
