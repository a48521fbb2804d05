package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  // (user, ts_us, type) — µs precision kept within ms for Timestamp fixture
  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, s) => (u, ts(t * 1000), s) }
      .toDF("user_id", "ts", "event_type")

  test("funnel: earliest strictly-after chain, partial depths, non-participants") {
    val events = ev(
      // user 1: full conversion, earliest chain 10 -> 20 -> 40
      (1L, 10L, "view"), (1L, 5L, "click"),   // click BEFORE first view: no
      (1L, 20L, "click"), (1L, 40L, "purchase"), (1L, 30L, "view"),
      // user 2: stalls at click (purchase precedes it)
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // user 3: only noise events
      (3L, 10L, "error"),
      // user 4: same-ts tie must NOT satisfy strictly-after
      (4L, 10L, "view"), (4L, 10L, "click"), (4L, 50L, "click"),
      (4L, 50L, "purchase"))
    val out = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    def us(ms: Long) = ms * 1000
    assert(out == Seq(
      (1L, 3L, us(10), us(40), us(30)),
      (2L, 2L, us(10), us(30), -1L),
      (3L, 0L, -1L, -1L, -1L),
      (4L, 2L, us(10), us(50), -1L)), s"unexpected: $out")
  }

  test("funnel: conversion window caps later steps") {
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 500L, "purchase"),
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 60L, "purchase"))
    val out = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"),
        windowUs = Some(100L * 1000))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, 2L, 10000L, 20000L, -1L)),
      s"purchase outside window must not count: ${out(0)}")
    assert(out(1) == ((2L, 3L, 10000L, 60000L, 50000L)), s"${out(1)}")
  }

  test("retention: cohort by first day, offsets, exact fractions") {
    def day(d: Int, h: Int = 0) =
      java.sql.Timestamp.valueOf(f"2026-01-${d}%02d $h%02d:00:00")
    val events = Seq(
      (1L, day(1)), (1L, day(1, 5)), (1L, day(2)), (1L, day(4)),
      (2L, day(1)), (2L, day(3)),
      (3L, day(2)), (3L, day(3))
    ).toDF("user_id", "ts")
    val got = Funnel.retention(events, col("user_id"), col("ts"))
      .orderBy("cohort_day", "offset_days")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("2026-01-01", 0L, 2L, 2L, 1.0),   // users 1,2 day0
      ("2026-01-01", 1L, 1L, 2L, 0.5),   // user 1 on day2
      ("2026-01-01", 2L, 1L, 2L, 0.5),   // user 2 on day3
      ("2026-01-01", 3L, 1L, 2L, 0.5),   // user 1 on day4
      ("2026-01-02", 0L, 1L, 1L, 1.0),   // user 3
      ("2026-01-02", 1L, 1L, 1L, 1.0)), s"unexpected: $got")
  }

  test("funnel: deterministic under repartitioning") {
    val rnd = new scala.util.Random(3)
    val types = Seq("view", "click", "purchase", "error")
    val events = (0 until 2000).map { i =>
      (rnd.nextInt(37).toLong, ts(rnd.nextInt(100000).toLong * 1000),
        types(rnd.nextInt(types.size)))
    }.toDF("user_id", "ts", "event_type")
    val a = Funnel.funnel(events, col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("user_id").collect().toSeq
    val b = Funnel.funnel(events.repartition(13), col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("user_id").collect().toSeq
    assert(a == b, "funnel result depends on partitioning")
  }
}
