package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsIntegrateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val series =
    (0 until 1000).map(i => (i.toLong, math.sin(i * 0.01))).toDF("idx", "v")

  test("featurize produces n-history-pred+1 = 986 windows (reference count)") {
    val w = SlidingWindows.featurize(series, col("idx"), col("v"), 10, 5)
    assert(w.count() == 986)
    val first = w.orderBy("win_id").head()
    assert(first.getAs[collection.Seq[Double]]("hist").size == 10)
    assert(first.getAs[collection.Seq[Double]]("target").size == 5)
  }

  test("featurizeByIndex (blocked, scalable) equals the global-sort version") {
    val a = SlidingWindows.featurize(series, col("idx"), col("v"), 10, 5)
      .select(col("win_id"), col("hist"), col("target"))
    // small blockSize to force many blocks + seams
    val b = SlidingWindows.featurizeByIndex(series, col("idx"), col("v"), 10, 5,
      blockSize = 64)
    assert(b.count() == 986)
    val aRows = a.orderBy("win_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2)))
    val bRows = b.orderBy("win_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2)))
    assert(aRows.length == bRows.length)
    aRows.zip(bRows).foreach { case (x, y) => assert(x == y) }
  }

  test("window contents align: hist = v[i..i+9], target = v[i+10..i+14]") {
    val w = SlidingWindows.featurizeByIndex(series, col("idx"), col("v"), 10, 5,
      blockSize = 100)
    val r = w.filter(col("win_id") === 42L).head()
    val hist = r.getSeq[Double](1)
    val target = r.getSeq[Double](2)
    assert(hist == (42 until 52).map(i => math.sin(i * 0.01)))
    assert(target == (52 until 57).map(i => math.sin(i * 0.01)))
  }

  test("trapz of y=x^2 on [0,1] ~ 1/3") {
    val grid = (0 to 1000).map(i => i / 1000.0).map(x => (x, x * x)).toDF("x", "y")
    val got = Integrate.trapz(grid, col("x"), col("y")).head().getDouble(0)
    assert(math.abs(got - 1.0 / 3) < 1e-6, s"got $got")
  }

  test("trapzByIndex (join form) equals trapz (window form) on a dense series") {
    val s = (0 until 2000).map(i => (i.toLong, i / 2000.0, math.sin(i * 0.01)))
      .toDF("i", "x", "y")
    val a = Integrate.trapz(s, col("x"), col("y")).head().getDouble(0)
    val b = Integrate.trapzByIndex(s, col("i"), col("x"), col("y")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-9, s"$a vs $b")
  }

  test("trapzGrid: bilinear integrand is exact; separable quadratic converges") {
    // y = x1*x2 on [0,1]^2 -> 1/4, exact for the trapezoid rule (bilinear)
    val n = 40
    val grid2 = (for (i <- 0 to n; j <- 0 to n)
      yield (i.toDouble / n, j.toDouble / n, (i.toDouble / n) * (j.toDouble / n)))
      .toDF("x1", "x2", "y")
    val got = Integrate.trapzGrid(grid2, Seq("x1", "x2"), col("y"))
      .head().getDouble(0)
    assert(math.abs(got - 0.25) < 1e-12, s"got $got")
    // y = x1^2 * x2^2 -> 1/9, trapezoid error O(h^2)
    val grid3 = (for (i <- 0 to n; j <- 0 to n)
      yield (i.toDouble / n, j.toDouble / n,
        math.pow(i.toDouble / n, 2) * math.pow(j.toDouble / n, 2)))
      .toDF("x1", "x2", "y")
    val got3 = Integrate.trapzGrid(grid3, Seq("x1", "x2"), col("y"))
      .head().getDouble(0)
    assert(math.abs(got3 - 1.0 / 9) < 1e-3, s"got $got3")
    // 1-D degenerates to trapz
    val line = (0 to 1000).map(i => (i / 1000.0, i / 1000.0 * (i / 1000.0))).toDF("x", "y")
    val got1 = Integrate.trapzGrid(line, Seq("x"), col("y")).head().getDouble(0)
    assert(math.abs(got1 - 1.0 / 3) < 1e-6, s"got $got1")
  }

  test("minMaxScale maps min->0 max->1") {
    val df = Seq(10.0, 20.0, 15.0).toDF("v")
    val got = Integrate.minMaxScale(df, col("v"), "s")
      .orderBy("v").select("s").as[Double].collect().toSeq
    assert(got == Seq(0.0, 0.5, 1.0))
  }

  test("histogram counts and density normalize") {
    val df = (Seq.fill(30)(0.5) ++ Seq.fill(70)(2.5)).toDF("v")
    val h = Integrate.histogram(df, col("v"), 0.0, 4.0, 4)
      .orderBy("bucket").collect()
    assert(h.map(_.getAs[Long]("cnt")).toSeq == Seq(30L, 70L))
    // density integrates to 1: sum(density*width) = 1
    assert(math.abs(h.map(_.getAs[Double]("density")).sum * 1.0 - 1.0) < 1e-12)
  }
}
