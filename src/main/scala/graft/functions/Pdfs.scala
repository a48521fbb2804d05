package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Probability-density column expressions.
  *
  * Re-expression of the reference's pdf surface
  * (reference `core/inputs.py:159-162` Gaussian, `:187-193` Uniform,
  * `:240-244` LogNormal) as pure Catalyst column expressions — literal-heavy,
  * constant-folded, whole-stage-codegen'd; no UDFs.
  */
object Pdfs {
  private val InvSqrt2Pi = 1.0 / math.sqrt(2.0 * math.Pi)

  /** 1-D Gaussian density N(mu, sigma^2) evaluated at column x. */
  def gaussianPdf(x: Column, mu: Double, sigma: Double): Column =
    lit(InvSqrt2Pi / sigma) * exp(lit(-0.5) * pow((x - lit(mu)) / lit(sigma), 2))

  /** Product of independent per-dimension Gaussians (diagonal covariance),
    * the reference's multivariate case (`inputs.py:159-162` with diag cov). */
  def gaussianPdfNd(xs: Seq[Column], mus: Seq[Double], sigmas: Seq[Double]): Column =
    xs.lazyZip(mus).lazyZip(sigmas).map(gaussianPdf).reduce(_ * _)

  /** Uniform density over [lo, hi]: indicator / width
    * (reference `inputs.py:187-193`). */
  def uniformPdf(x: Column, lo: Double, hi: Double): Column =
    when(x >= lit(lo) && x <= lit(hi), lit(1.0 / (hi - lo))).otherwise(lit(0.0))

  /** LogNormal density (reference `inputs.py:240-244`). */
  def logNormalPdf(x: Column, mu: Double, sigma: Double): Column =
    when(x > 0,
      lit(InvSqrt2Pi / sigma) / x * exp(lit(-0.5) * pow((log(x) - lit(mu)) / lit(sigma), 2)))
      .otherwise(lit(0.0))

  /** The reference's synthetic 2-D label
    * `y = x1^3 - x1 + x2^2 + 0.5*sin(8*x1*x2)`
    * (reference `BigDataQualityAssessment_ActiveSampling.py:27`). */
  def syntheticLabel(x1: Column, x2: Column): Column =
    pow(x1, 3) - x1 + pow(x2, 2) + lit(0.5) * sin(lit(8.0) * x1 * x2)

  /** clip(v, lo, +inf) — reference `np.clip(log_pdf, -6, None)`
    * (`BigDataQualityAssessment_ActiveSampling.py:213-214`). */
  def clipLower(v: Column, lo: Double): Column = greatest(lit(lo), v)

  /** Finite filter — reference `np.isfinite` mask
    * (`BigDataQualityAssessment_ActiveSampling.py:217-219`). */
  def isFinite(v: Column): Column =
    !isnan(v) && v =!= lit(Double.PositiveInfinity) && v =!= lit(Double.NegativeInfinity)
}
