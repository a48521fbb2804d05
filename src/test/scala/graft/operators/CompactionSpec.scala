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
}
