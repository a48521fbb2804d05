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

  test("robustOutliers flags planted spikes and not the bulk") {
    // 103 values: -900, 0..100, 1000 -> median 50; abs deviations sorted
    // run 0,1,1,2,2,... so the 51st (0-based) is 26 -> MAD 26; both spikes
    // sit at |x-50| = 950 >> 3.5 * 1.4826 * 26 ≈ 134.9
    val vals = (0 to 100).map(_.toDouble) ++ Seq(1000.0, -900.0)
    val d = vals.map(v => (v, v / 2)).toDF("a", "b")
    for (approx <- Seq(true, false)) {
      // both modes agree here: at n=103 the sketch is exact and the odd
      // count makes the interpolated median a data value
      val got = Profiling.robustOutliers(d, Seq("a", "b"), approx = approx)
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
      assert(got("a") == ((50.0, 26.0, 2L)), s"approx=$approx: ${got("a")}")
      assert(got("b") == ((25.0, 13.0, 2L)), s"approx=$approx: ${got("b")}")
    }
  }

  test("approxOutlierGate passes when the sketch tracks the data") {
    val vals = (0 to 100).map(_.toDouble) ++ Seq(1000.0, -900.0)
    val d = vals.map(v => (v, v / 2)).toDF("a", "b")
    assert(Profiling.approxOutlierGate(d, Seq("a", "b")) ==
      Map("a" -> 1L, "b" -> 1L))
  }

  test("profile exact mode matches approx mode on small-cardinality data") {
    val exact = Profiling.profile(df, Seq("x", "s"), approxDistinct = false)
      .collect().map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(exact == Map("x" -> 2L, "s" -> 2L))
  }
}
