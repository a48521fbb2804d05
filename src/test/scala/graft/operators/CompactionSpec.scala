package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps exactly the newest version per key") {
    val changes = Seq(
      ("a", 1L, 10L, "v1"), ("a", 3L, 11L, "v3"), ("a", 2L, 12L, "v2"),
      ("b", 5L, 13L, "only"),
      ("c", 7L, 14L, "older"), ("c", 7L, 15L, "same-ts-higher-seq")
    ).toDF("key", "ts", "seq", "value")
    val out = Compaction.latestByKey(changes, Seq("key"), Seq("ts", "seq"),
        Seq("value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3))).toMap
    assert(out("a") == ((3L, 11L, "v3")))
    assert(out("b") == ((5L, 13L, "only")))
    // equal timestamps: the unique sequence id breaks the tie
    assert(out("c") == ((7L, 15L, "same-ts-higher-seq")))
    assert(out.size == 3)
  }

  test("compaction equals the window-argmax form with map-side combine") {
    val n = 5000
    val changes = (0 until n).map { i =>
      (s"k${i % 97}", (i * 31 % 1000).toLong, i.toLong, i.toDouble)
    }.toDF("key", "ts", "seq", "value")
    val compacted = Compaction.latestByKey(changes, Seq("key"),
      Seq("ts", "seq"), Seq("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(desc("ts"), desc("seq"))
    val viaWindow = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(compacted.orderBy("key").collect().map(_.toSeq).toSeq ==
      viaWindow.orderBy("key").collect().map(_.toSeq).toSeq)
    // the property that matters at scale: a PARTIAL max runs before the
    // exchange, so the shuffle carries one candidate per key per
    // partition, not the full change history (the window form's cost)
    val plan = compacted.queryExecution.executedPlan.toString
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_max")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected map-side partial_max below the exchange in:\n$plan")
    assert(!plan.contains("Window"), "compaction must not use a window")
  }

  test("scd2Intervals: collapse, interval chain, NULL-closed current row") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // user 1: a@10, a@20 (re-statement — no change), b@30, a@40
    // user 2: x@5 only
    val log = Seq((1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 5L, "x"))
      .toDF("uid", "sec", "et")
      .select(col("uid"), timestamp_seconds(col("sec")).as("ts"), col("et"))
    val got = Compaction.scd2Intervals(log, col("uid"), col("ts"), col("et"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "a", 10L, 30L, 1L), (1L, "b", 30L, 40L, 2L), (1L, "a", 40L, -1L, 3L),
      (2L, "x", 5L, -1L, 1L)))
  }

  test("scd2Intervals: equal-timestamp changes order by attr; repartition-stable") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val log = Seq((1L, 10L, "b"), (1L, 10L, "a"), (1L, 10L, "a"), (1L, 20L, "c"))
      .toDF("uid", "sec", "et")
      .select(col("uid"), timestamp_seconds(col("sec")).as("ts"), col("et"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Compaction.scd2Intervals(df, col("uid"), col("ts"), col("et"))
        .collect().map(_.toSeq).toSet
    val a = run(log)
    assert(a == run(log.repartition(7)))
    // at t=10 'a' sorts before 'b': a[10,10) v1, b[10,20) v2, c[10..] v3
    val versions = a.map(r => (r(1), r(4))).toSet
    assert(versions == Set(("a", 1L), ("b", 2L), ("c", 3L)), versions.toString)
  }

  test("scd2Intervals: the NULL-closed row agrees with latestByKey") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val rnd = new scala.util.Random(3)
    val log = (0 until 400).map { i =>
      (rnd.nextInt(10).toLong, (i + 1).toLong, s"v${rnd.nextInt(4)}") }
      .toDF("uid", "sec", "et")
      .select(col("uid"), timestamp_seconds(col("sec")).as("ts"), col("et"))
    val current = Compaction.scd2Intervals(log, col("uid"), col("ts"), col("et"))
      .filter(col("valid_to").isNull)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val latest = Compaction.latestByKey(
        log.withColumn("sec", col("ts").cast("long")),
        Seq("uid"), Seq("sec"), Seq("et"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("et")).toMap
    assert(current == latest)
  }
}
