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

  /** Lower-triangular Cholesky factor of a (small) SPD matrix. */
  private def cholesky(cov: Array[Array[Double]]): Array[Array[Double]] = {
    val d = cov.length
    val L = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 to i) {
      val s = (0 until j).map(k => L(i)(k) * L(j)(k)).sum
      if (i == j) {
        val v = cov(i)(i) - s
        require(v > 0, s"covariance not positive definite at diagonal $i")
        L(i)(i) = math.sqrt(v)
      } else L(i)(j) = (cov(i)(j) - s) / L(j)(j)
    }
    L
  }

  /** Forward-substitution z = L⁻¹ (x − mu) as column expressions. */
  private def whiten(xs: Seq[Column], mus: Seq[Double],
                     L: Array[Array[Double]]): Array[Column] = {
    val d = xs.size
    val diffs = xs.zip(mus).map { case (x, m) => x - lit(m) }
    val z = new Array[Column](d)
    for (i <- 0 until d) {
      val s = (0 until i).foldLeft(diffs(i): Column)((acc, k) => acc - lit(L(i)(k)) * z(k))
      z(i) = s / lit(L(i)(i))
    }
    z
  }

  /** Full-covariance multivariate Gaussian N(mu, Σ) at columns xs — the
    * reference's `pdinv(cov)` density (reference `core/inputs.py:150-171`).
    * The Cholesky factor, log-determinant, and normalizer are computed
    * driver-side from the literal covariance; the per-row work is the
    * whitened quadratic form ‖L⁻¹(x−mu)‖² — constant-folded, codegen'd.
    * Substitution inlines z-subtrees, so intended for small d (≲ 8, the
    * reference's input dimensionalities); materialize intermediate columns
    * for wider inputs. */
  def gaussianPdfFullCov(xs: Seq[Column], mus: Seq[Double],
                         cov: Array[Array[Double]]): Column = {
    val d = xs.size
    require(cov.length == d && mus.size == d, "dimension mismatch")
    val L = cholesky(cov)
    val logDet = 2.0 * (0 until d).map(i => math.log(L(i)(i))).sum
    val norm = math.exp(-0.5 * (d * math.log(2.0 * math.Pi) + logDet))
    val z = whiten(xs, mus, L)
    val q = z.map(c => c * c).reduce(_ + _)
    lit(norm) * exp(lit(-0.5) * q)
  }

  /** Gradient of [[gaussianPdfFullCov]] w.r.t. x — the reference's
    * `pdf_jac` for the Gaussian family (`inputs.py:164-167`):
    * ∇pdf = −pdf · Σ⁻¹(x−mu), with Σ⁻¹(x−mu) = L⁻ᵀ z by back
    * substitution. Returns the d partial-derivative columns. */
  def gaussianPdfJacFullCov(xs: Seq[Column], mus: Seq[Double],
                            cov: Array[Array[Double]]): Seq[Column] = {
    val d = xs.size
    require(cov.length == d && mus.size == d, "dimension mismatch")
    val L = cholesky(cov)
    val pdf = gaussianPdfFullCov(xs, mus, cov)
    val z = whiten(xs, mus, L)
    // back substitution: Lᵀ w = z
    val w = new Array[Column](d)
    for (i <- (d - 1) to 0 by -1) {
      val s = ((i + 1) until d).foldLeft(z(i): Column)((acc, k) => acc - lit(L(k)(i)) * w(k))
      w(i) = s / lit(L(i)(i))
    }
    w.map(wi => lit(-1.0) * pdf * wi).toSeq
  }

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
