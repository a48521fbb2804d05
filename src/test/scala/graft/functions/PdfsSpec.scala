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
