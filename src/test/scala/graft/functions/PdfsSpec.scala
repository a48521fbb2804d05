package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PdfsSpec extends SparkSpec {
  import spark.implicits._

  private def evalAt(c: org.apache.spark.sql.Column, x: Double): Double =
    Seq(x).toDF("x").select(c.as("r")).as[Double].head()

  test("gaussian pdf matches closed form") {
    // N(0,1) at 0 = 1/sqrt(2pi); at 1 = exp(-1/2)/sqrt(2pi)
    assert(math.abs(evalAt(Pdfs.gaussianPdf(col("x"), 0, 1), 0.0)
      - 1.0 / math.sqrt(2 * math.Pi)) < 1e-12)
    assert(math.abs(evalAt(Pdfs.gaussianPdf(col("x"), 0, 1), 1.0)
      - math.exp(-0.5) / math.sqrt(2 * math.Pi)) < 1e-12)
    // scaling: N(2, 0.5^2) at 2 = 1/(0.5 sqrt(2pi))
    assert(math.abs(evalAt(Pdfs.gaussianPdf(col("x"), 2, 0.5), 2.0)
      - 1.0 / (0.5 * math.sqrt(2 * math.Pi))) < 1e-12)
  }

  test("multidim gaussian is the product of per-dim densities") {
    val c = Pdfs.gaussianPdfNd(Seq(col("x"), col("x")), Seq(0.0, 0.0), Seq(1.0, 1.0))
    val single = 1.0 / math.sqrt(2 * math.Pi)
    assert(math.abs(evalAt(c, 0.0) - single * single) < 1e-12)
  }

  test("full-covariance gaussian matches closed form and the diagonal product") {
    def evalAt2(c: org.apache.spark.sql.Column, x1: Double, x2: Double): Double =
      Seq((x1, x2)).toDF("x1", "x2").select(c.as("r")).as[Double].head()
    // diagonal covariance reduces to the per-dim product
    val diag = Pdfs.gaussianPdfFullCov(Seq(col("x1"), col("x2")), Seq(0.0, 0.0),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val prod = Pdfs.gaussianPdfNd(Seq(col("x1"), col("x2")), Seq(0.0, 0.0), Seq(1.0, 1.0))
    assert(math.abs(evalAt2(diag, 0.7, -0.3) - evalAt2(prod, 0.7, -0.3)) < 1e-12)
    // correlated case vs the explicit 2-D closed form with rho = 0.5
    val rho = 0.5
    val full = Pdfs.gaussianPdfFullCov(Seq(col("x1"), col("x2")), Seq(1.0, -1.0),
      Array(Array(1.0, rho), Array(rho, 1.0)))
    def closed(x1: Double, x2: Double): Double = {
      val d1 = x1 - 1.0; val d2 = x2 + 1.0
      val q = (d1 * d1 - 2 * rho * d1 * d2 + d2 * d2) / (1 - rho * rho)
      math.exp(-0.5 * q) / (2 * math.Pi * math.sqrt(1 - rho * rho))
    }
    for ((a, b) <- Seq((1.0, -1.0), (0.0, 0.0), (2.5, -0.5)))
      assert(math.abs(evalAt2(full, a, b) - closed(a, b)) < 1e-12, s"at ($a,$b)")
  }

  test("full-covariance gaussian jacobian matches finite differences") {
    val cov = Array(Array(1.0, 0.4), Array(0.4, 2.0))
    val mus = Seq(0.5, -0.5)
    val xs = Seq(col("x1"), col("x2"))
    val jac = Pdfs.gaussianPdfJacFullCov(xs, mus, cov)
    val df = Seq((0.9, 0.2)).toDF("x1", "x2")
    val got = df.select(jac(0).as("j1"), jac(1).as("j2")).as[(Double, Double)].head()
    def pdfAt(x1: Double, x2: Double): Double =
      Seq((x1, x2)).toDF("x1", "x2")
        .select(Pdfs.gaussianPdfFullCov(Seq(col("x1"), col("x2")), mus, cov).as("p"))
        .as[Double].head()
    val h = 1e-6
    val fd1 = (pdfAt(0.9 + h, 0.2) - pdfAt(0.9 - h, 0.2)) / (2 * h)
    val fd2 = (pdfAt(0.9, 0.2 + h) - pdfAt(0.9, 0.2 - h)) / (2 * h)
    assert(math.abs(got._1 - fd1) < 1e-7, s"j1 ${got._1} vs fd $fd1")
    assert(math.abs(got._2 - fd2) < 1e-7, s"j2 ${got._2} vs fd $fd2")
  }

  test("uniform pdf: indicator / width") {
    val c = Pdfs.uniformPdf(col("x"), 2.0, 6.0)
    assert(evalAt(c, 3.0) == 0.25)
    assert(evalAt(c, 2.0) == 0.25 && evalAt(c, 6.0) == 0.25) // inclusive edges
    assert(evalAt(c, 1.9) == 0.0 && evalAt(c, 6.1) == 0.0)
  }

  test("lognormal pdf matches closed form and is 0 for x<=0") {
    val c = Pdfs.logNormalPdf(col("x"), 0.0, 1.0)
    // at x=1: 1/(1*sqrt(2pi)) * exp(0) = 1/sqrt(2pi)
    assert(math.abs(evalAt(c, 1.0) - 1.0 / math.sqrt(2 * math.Pi)) < 1e-12)
    assert(evalAt(c, 0.0) == 0.0 && evalAt(c, -1.0) == 0.0)
  }

  test("clip and finite filters") {
    assert(evalAt(Pdfs.clipLower(col("x"), -6.0), -10.0) == -6.0)
    assert(evalAt(Pdfs.clipLower(col("x"), -6.0), 3.0) == 3.0)
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("v")
    assert(df.filter(Pdfs.isFinite(col("v"))).count() == 1)
  }
}
