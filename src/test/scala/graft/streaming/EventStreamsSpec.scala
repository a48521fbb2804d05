package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {

  /** FileStreamSource needs a directory: stage the fixture file into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming hourly agg matches the batch result on closed windows") {
    val streamed = EventStreams.hourlyByType(EventStreams.readEvents(spark, eventsDir))
    // complete mode over the static fixture: every window closes
    val got = EventStreams.runToMemory(spark, streamed, "hourly_test", "complete")
      .select("window_start", "event_type", "n", "sum_value")

    val batch = Tables.events(spark, sf001)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).count() == 0, "stream/batch mismatch")
  }

  test("stateful session counts (mapGroupsWithState) match batch sessionize") {
    val streamed = EventStreams.statefulSessionCounts(
      EventStreams.readEvents(spark, eventsDir), gapSeconds = 1800)
    val got = EventStreams.runToMemory(spark, streamed, "sessions_test", "update")
      .groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))

    val batch = graft.operators.Joins.sessionize(
        Tables.events(spark, sf001), Seq("user_id"), col("ts"), gapSeconds = 1800)
      .groupBy("user_id")
      .agg(countDistinct("session_id").as("n_sessions"), count(lit(1)).as("n_events"))

    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).count() == 0, "stateful stream != batch sessionize")
  }

  test("streaming dedup keeps one row per key and matches batch distinct") {
    // duplicate the fixture file so every event arrives twice
    val dupDir = java.nio.file.Files.createTempDirectory("graft-stream-dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dupDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dupDir.resolve("b.parquet"))
    val streamed = EventStreams.dedupEvents(
      EventStreams.readEvents(spark, dupDir.toString))
    val got = EventStreams.runToMemory(spark, streamed, "dedup_test", "append")
    val batch = Tables.events(spark, sf001)
    assert(got.count() == batch.count(),
      s"dedup kept ${got.count()} of 2x${batch.count()} rows")
    assert(got.select("event_id").distinct().count() == batch.count())
  }

  test("sliding windows emit overlapping frames with sane stats") {
    val streamed = EventStreams.slidingValueStats(EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, streamed, "sliding_test", "complete")
    assert(got.count() > 0)
    val r = got.head()
    assert(r.getAs[Double]("min_value") <= r.getAs[Double]("mean_value"))
    assert(r.getAs[Double]("mean_value") <= r.getAs[Double]("max_value"))
    // sliding 30m/10m → each event lands in 3 windows: total n across
    // windows = 3x event count
    val totalN = got.agg(sum("n")).head().getLong(0)
    val events = Tables.events(spark, sf001).count()
    assert(totalN == 3 * events, s"$totalN != 3*$events")
  }
}
