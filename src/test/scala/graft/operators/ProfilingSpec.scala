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

  test("drift: identical snapshots score zero everywhere") {
    val snap = Seq((1.0, "en", Seq("a", "b")), (2.0, "fr", Seq("b", "c")))
      .toDF("v", "lang", "toks")
    val out = Profiling.drift(snap, snap, numeric = Seq("v"),
      categorical = Seq("lang"), tokens = Some("toks"))
    assert(out.count() == 10 + 1 + 2 + 1 + 1) // bins + psi + cats + psi + kl
    assert(out.filter(col("contrib") =!= 0.0).count() == 0)
  }

  test("drift: planted numeric shift and category flip raise PSI; KL > 0") {
    val a = (0 until 100).map(i => (i % 10 * 1.0, "en", Seq("alpha", "beta")))
      .toDF("v", "lang", "toks")
    val b = (0 until 100).map(i => (50.0 + i % 10, "de", Seq("gamma")))
      .toDF("v", "lang", "toks")
    val out = Profiling.drift(a, b, numeric = Seq("v"),
      categorical = Seq("lang"), tokens = Some("toks"))
    val psi = out.filter(col("bucket") === "__psi")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // disjoint ranges/categories: PSI far beyond the 0.2 "investigate" bar
    assert(psi("v") > 1.0, s"numeric psi: $psi")
    assert(psi("lang") > 1.0, s"categorical psi: $psi")
    val kl = out.filter(col("bucket") === "__kl").head().getDouble(4)
    assert(kl > 1.0, s"token kl: $kl")
    // closed-form numeric check: combined range [0, 59], width 5.9 — A's
    // values 0..5 (60 rows) land in bucket 0, so pa(0)=0.6; B contributes
    // nothing there → pb clamps to eps. term = (0.6 − 1e-4)·ln(0.6/1e-4)
    val b0 = out.filter(col("column") === "v" && col("bucket") === "0")
      .head().getDouble(4)
    val expected = BigDecimal((0.6 - 1e-4) * math.log(0.6 / 1e-4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(b0 - expected) < 1e-9, s"bucket0 term $b0 vs $expected")
  }

  test("drift: KL of identical token multisets is zero even with smoothing") {
    val a = Seq((Seq("x", "x", "y")), (Seq("z"))).toDF("toks")
    val out = Profiling.drift(a, a, tokens = Some("toks"))
    assert(out.filter(col("bucket") === "__kl").head().getDouble(4) == 0.0)
  }

  test("anomalyZScores: previous-bucket baseline, flags, first-bucket omitted") {
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    // hour 0: values 1,3 (mu=2, var=1); hour 1: 2 (z=0), 12 (z=10 -> anom)
    // hour 1 stats (mu=7, var=25) baseline hour 2: value 7 -> z=0
    val events = Seq(
      (1L, "a", t(0, 0), 1.0), (2L, "a", t(0, 30), 3.0),
      (3L, "a", t(1, 0), 2.0), (4L, "a", t(1, 30), 12.0),
      (5L, "a", t(2, 0), 7.0),
      (6L, "b", t(1, 0), 99.0) // first bucket for key b: no baseline
    ).toDF("event_id", "event_type", "ts", "value")
    val got = Profiling.anomalyZScores(events, col("event_id"),
        col("event_type"), col("ts"), col("value"))
      .orderBy("event_id")
      .select("event_id", "z", "is_anom", "baseline_n")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(got == Seq(
      (3L, 0.0, 0L, 2L), (4L, 10.0, 1L, 2L), (5L, 0.0, 0L, 2L)),
      s"unexpected: $got")
  }
}
