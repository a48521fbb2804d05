package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfBackward picks the latest right row at or before each left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 50.0)
    ).toDF("k", "qt", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), // equal ts -> matches 100.0
      (1L, ts("2024-01-01 10:04:59"), "b"), // before second quote -> 100.0
      (1L, ts("2024-01-01 10:06:00"), "c"), // after -> 101.0
      (2L, ts("2024-01-01 10:01:00"), "d"), // before any quote -> null
      (3L, ts("2024-01-01 10:00:00"), "e")  // key never quoted -> null
    ).toDF("k", "tt", "tag")

    val got = Joins.asOfBackward(trades, quotes, Seq("k"),
        col("tt"), col("qt"), Map("price" -> "quote_price"))
      .select("tag", "quote_price").as[(String, Option[Double])]
      .collect().toMap
    assert(got("a").contains(100.0))
    assert(got("b").contains(100.0))
    assert(got("c").contains(101.0))
    assert(got("d").isEmpty)
    assert(got("e").isEmpty)
  }

  test("asOfBackward carries all columns from ONE matched row, preserving its NULLs") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), "m1"),
      (1L, ts("2024-01-01 10:05:00"), None: Option[Double], "m2") // later row, NULL price
    ).toDF("k", "qt", "price", "mark")
    val trades = Seq((1L, ts("2024-01-01 10:06:00"), "x")).toDF("k", "tt", "tag")
    val got = Joins.asOfBackward(trades, quotes, Seq("k"),
        col("tt"), col("qt"), Map("price" -> "quote_price", "mark" -> "quote_mark"))
      .select("quote_price", "quote_mark").as[(Option[Double], String)].head()
    // matched row is the 10:05 quote: its genuine NULL price must survive
    // (per-column last(ignoreNulls) would leak 100.0 from the older row)
    assert(got._1.isEmpty, s"NULL payload leaked an older value: $got")
    assert(got._2 == "m2")
  }

  test("sessionize splits on gaps and numbers sessions per key") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),  // same session
      (1L, ts("2024-01-01 11:00:00")),  // 50 min gap -> new session
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "t")
    val got = Joins.sessionize(events, Seq("user_id"), col("t"), gapSeconds = 1800)
      .select("user_id", "t", "session_id")
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .map { case (u, t, s) => (u, t.toString.take(19), s) }.toSet
    assert(got == Set(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:10:00", 1L),
      (1L, "2024-01-01 11:00:00", 2L),
      (2L, "2024-01-01 09:00:00", 1L)))
  }

  test("sessionize: exactly-at-gap boundary stays in the same session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00"))   // exactly 30 min -> NOT a break
    ).toDF("user_id", "t")
    val got = Joins.sessionize(events, Seq("user_id"), col("t"), gapSeconds = 1800)
      .select("session_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("saltedJoin returns exactly the plain equi-join rows on a skewed key") {
    // 90% of the large side lands on key 1 (the skew case salting exists for)
    val large = (0 until 1000).map(i => (if (i < 900) 1L else i.toLong, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (5L, "cold"), (901L, "x")).toDF("k", "name")
    val salted = Joins.saltedJoin(large, small, Seq("k"), salt = 8)
      .select("k", "payload", "name").as[(Long, Int, String)].collect().sorted
    val plain = large.join(small, "k")
      .select("k", "payload", "name").as[(Long, Int, String)].collect().sorted
    assert(salted.sameElements(plain))
    assert(salted.length == 901) // 900 hot + k=901 (k=5 has no large rows)
  }

  test("interpolationJoin lerps between knots with np.interp edge semantics") {
    val probes = Seq(
      (1L, 10L, 5.0),   // before first knot -> clamp to y(10)=1.0
      (1L, 11L, 10.0),  // exactly on a knot -> 1.0
      (1L, 12L, 15.0),  // midway 10..20 -> 1.5
      (1L, 13L, 17.5),  // 3/4 of the way -> 1.75
      (1L, 14L, 25.0),  // past last knot -> clamp to y(20)=2.0
      (2L, 15L, 1.0)    // key with no knots -> NULL
    ).toDF("k", "pid", "x")
    val knots = Seq((1L, 10.0, 1.0), (1L, 20.0, 2.0)).toDF("k", "kx", "ky")
    val got = Joins.interpolationJoin(probes, knots, Seq("k"),
        col("x"), col("kx"), col("ky"))
      .select("pid", "y_interp").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      10L -> Some(1.0), 11L -> Some(1.0), 12L -> Some(1.5),
      13L -> Some(1.75), 14L -> Some(2.0), 15L -> None), s"$got")
  }

  test("interpolationJoin: NULL keys/x yield NULL, never cross-NULL matches") {
    val probes = Seq(
      (Option(1L), 20L, Option(15.0)),   // normal
      (Option.empty[Long], 21L, Option(15.0)), // NULL key -> NULL
      (Option(1L), 22L, Option.empty[Double])  // NULL x -> NULL
    ).toDF("k", "pid", "x")
    val knots = Seq(
      (Option(1L), Option(10.0), 1.0),
      (Option(1L), Option(20.0), 2.0),
      (Option.empty[Long], Option(10.0), 99.0), // NULL-key knot: ignored
      (Option(1L), Option.empty[Double], 77.0)  // NULL-x knot: ignored
    ).toDF("k", "kx", "ky")
    val got = Joins.interpolationJoin(probes, knots, Seq("k"),
        col("x"), col("kx"), col("ky"))
      .select("pid", "y_interp").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(20L -> Some(1.5), 21L -> None, 22L -> None), s"$got")
  }

  test("rangeJoin matches a naive equi-join + range filter, boundaries inclusive") {
    val points = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),  // == interval start
      (1L, 101L, ts("2024-01-01 10:29:00")),  // inside
      (1L, 102L, ts("2024-01-01 10:30:00")),  // == interval end (inclusive)
      (1L, 103L, ts("2024-01-01 10:31:00")),  // outside
      (1L, 104L, ts("2024-01-01 11:59:00")),  // inside second interval
      (2L, 105L, ts("2024-01-01 10:15:00")),  // right time, WRONG key
      (3L, 106L, ts("2024-01-01 10:15:00"))   // key with no intervals
    ).toDF("user_id", "pid", "t")
    val intervals = Seq(
      (1L, 200L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (1L, 201L, ts("2024-01-01 11:45:00"), ts("2024-01-01 12:10:00")),
      (2L, 202L, ts("2024-01-01 22:00:00"), ts("2024-01-01 23:00:00"))
    ).toDF("user_id", "iid", "s", "e")
    // bucket smaller than the interval length: intervals span several cells
    val got = Joins.rangeJoin(points, intervals, Seq("user_id"),
        col("t"), col("s"), col("e"), bucketSeconds = 600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, "user_id")
      .filter(col("t").between(col("s"), col("e")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 200L), (101L, 200L), (102L, 200L), (104L, 201L)))
    assert(got == naive)
  }
}
