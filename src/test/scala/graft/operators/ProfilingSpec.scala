package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1), Some("a")), (Some(2), None), (None, Some("b")), (Some(2), Some("a"))
  ).toDF("x", "s")

  test("profile computes null counts, distinct, min/max per column") {
    val p = Profiling.profile(df, Seq("x", "s")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("x").getAs[Long]("n_rows") == 4)
    assert(p("x").getAs[Long]("n_nulls") == 1)
    assert(p("x").getAs[Long]("n_distinct") == 2)
    assert(p("x").getAs[String]("min_value") == "1")
    assert(p("x").getAs[String]("max_value") == "2")
    assert(p("s").getAs[Long]("n_nulls") == 1)
    assert(math.abs(p("s").getAs[Double]("null_rate") - 0.25) < 1e-12)
  }

  test("validate counts violations per rule in one pass") {
    val d = Seq(1.0, 5.0, 60.0, -2.0).toDF("v")
    val got = Profiling.validate(d, Seq(
      Profiling.inRange("v", 0, 50), Profiling.nonNegative("v")))
      .collect().map(r => r.getAs[String]("rule") -> r.getAs[Long]("violations")).toMap
    assert(got("range_v") == 2)      // 60 and -2
    assert(got("non_negative_v") == 1)
  }

  test("null predicate counts as violation") {
    val d = Seq(Some(1.0), None).toDF("v")
    val got = Profiling.validate(d, Seq(Profiling.inRange("v", 0, 10))).collect()
    assert(got(0).getAs[Long]("violations") == 1)
  }

  test("duplicateKeys finds multiplicities") {
    val d = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k")
    val got = Profiling.duplicateKeys(d, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("dups")).toMap
    assert(got == Map(1L -> 2L, 3L -> 3L))
  }
}
