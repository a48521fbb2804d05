package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ColumnarSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("n", LongType), StructField("payload", StringType)))

  private def fixture = Seq(
    (0L, "a", 10L, "alpha"), (1L, "b", 250L, "beta éß€ unicode"),
    (2L, "a", 999L, ""), (3L, "c", 500L, "gamma\nnewline\ttab"),
    (4L, "b", 123L, "delta, \"quoted\"")
  ).toDF("id", "grp", "n", "payload")

  test("orc round-trip preserves every row and type exactly") {
    val dir = java.nio.file.Files.createTempDirectory("orc_spec_").toString
    ColumnarSources.writeOrc(fixture, dir, layoutCols = Seq("id"))
    val back = ColumnarSources.readOrc(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.collect().map(_.toSeq).toSet == fixture.collect().map(_.toSeq).toSet)
  }

  test("a comparison predicate reaches the orc scan as a pushed filter") {
    val dir = java.nio.file.Files.createTempDirectory("orc_spec_pd_").toString
    ColumnarSources.writeOrc(fixture, dir, layoutCols = Seq("id"))
    val q = ColumnarSources.readOrc(spark, dir, schema).filter(col("n") >= 200)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(n,200)"),
      s"expected n>=200 pushed to the ORC scan:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("schema-enforced read keeps only the declared columns (pruning-ready)") {
    val dir = java.nio.file.Files.createTempDirectory("orc_spec_pr_").toString
    ColumnarSources.writeOrc(fixture, dir)
    val narrow = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    val back = ColumnarSources.readOrc(spark, dir, narrow)
    assert(back.columns.toSeq == Seq("id", "n"))
    assert(back.agg(sum("n")).as[Long].head() == 10L + 250L + 999L + 500L + 123L)
  }
}
