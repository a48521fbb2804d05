package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The bucketed-ingest contract: tables written via Bucketed.writeBucketed
  * join on the bucket column with ZERO shuffle exchanges — the property
  * that moves the per-join corpus shuffle to ingest at 100 TB. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE to finalize the executed plan
    // AQE hides materialized exchanges inside leaf QueryStageExec wrappers —
    // recurse into them or every plan "contains no shuffles".
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case q: QueryStageExec => count(q.plan)
      case r: ReusedExchangeExec => count(r.child)
      case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed tables join and aggregate with zero shuffle exchanges") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (0L until 1000L).map(i => (i, s"text$i")).toDF("doc_id", "payload")
      val b = (0L until 1000L by 2L).map(i => (i, i * 2.0)).toDF("doc_id", "score")
      Bucketed.writeBucketed(a, "bkt_a", numBuckets = 4, Seq("doc_id"))
      Bucketed.writeBucketed(b, "bkt_b", numBuckets = 4, Seq("doc_id"))
      val joined = Bucketed.readBucketed(spark, "bkt_a")
        .join(Bucketed.readBucketed(spark, "bkt_b"), "doc_id")
      assert(joined.count() == 500)
      assert(shuffles(joined) == 0,
        "bucketed equi-join must not shuffle either side")
      // aggregation on the bucket key rides the same distribution
      val agg = Bucketed.readBucketed(spark, "bkt_a")
        .groupBy("doc_id").agg(count(lit(1)))
      assert(shuffles(agg) == 0, "bucketed groupBy must not shuffle")
      // sanity: the same join from plain (non-bucketed) frames DOES shuffle
      val plain = a.join(b, "doc_id")
      assert(shuffles(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
