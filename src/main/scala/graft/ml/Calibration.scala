package graft.ml

import graft.operators.Ranking
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Uncertainty calibration — the quality-assessment question asked OF the
  * quality model: does predicted variance track realized error? The
  * reference trusts its ensemble variance to steer acquisition
  * (`acquisition_fcn.py`: `us`/`us_lw` rank the pool by it); this
  * reliability table is how that trust is audited. Rows land in
  * equi-depth bins of predicted variance ([[Ranking.equiDepth]] — exact
  * ntile, no single-task window), and each bin reports expected variance
  * vs realized mean squared error: a calibrated scorer tracks the
  * diagonal, an overconfident one sits below it. One rank pass + one
  * aggregate — scales like q70. */
object Calibration {

  /** Reliability table: (bucket, n, expected_var, realized_mse), bucket =
    * equi-depth bin of `predVar` (ties broken by `id` for determinism).
    * `sqErr` is the realized squared error column ((pred − y)²). */
  def reliability(scored: DataFrame, predVar: Column, sqErr: Column,
                  id: Column, bins: Int): DataFrame =
    Ranking.equiDepth(
        scored.select(id.as("__id"), predVar.as("__v"), sqErr.as("__e")),
        col("__v"), Seq(col("__id")), k = bins)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(avg("__v"), 6).as("expected_var"),
        round(avg("__e"), 6).as("realized_mse"))
      .orderBy("bucket")
}
