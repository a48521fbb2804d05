package graft.ml

import graft.SparkSpec
import graft.operators.{Kde, KdeResult}
import org.apache.spark.sql.functions._

class DerivativesSpec extends SparkSpec {
  import spark.implicits._

  // analytic surface: f(x1,x2) = x1^2 + 3*x2 + x1*x2
  // jac = (2x1 + x2, 3 + x1); hess = [[2,1],[1,0]]
  private val scorer = AnalyticScorer(
    df => pow(col("x1"), 2) + lit(3.0) * col("x2") + col("x1") * col("x2"),
    df => lit(0.5))

  private lazy val pool = Seq(
    (1L, 0.5, -1.0), (2L, -2.0, 3.0), (3L, 0.0, 0.0)
  ).toDF("id", "x1", "x2")

  test("finite-difference jacobian and hessian match the analytic surface") {
    val model = scorer.fit(pool)
    val jh = Derivatives.jacobianHessian(pool, model, Seq("x1", "x2"), h = 1e-4)
    val rows = jh.select("id", "x1", "x2", "jac_1", "jac_2",
        "hess_1_1", "hess_1_2", "hess_2_2")
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((_, r) <- rows) {
      val x1 = r.getDouble(1); val x2 = r.getDouble(2)
      assert(math.abs(r.getDouble(3) - (2 * x1 + x2)) < 1e-5, "jac_1")
      assert(math.abs(r.getDouble(4) - (3 + x1)) < 1e-5, "jac_2")
      assert(math.abs(r.getDouble(5) - 2.0) < 1e-3, "hess_11")
      assert(math.abs(r.getDouble(6) - 1.0) < 1e-3, "hess_12")
      assert(math.abs(r.getDouble(7) - 0.0) < 1e-3, "hess_22")
    }
  }

  test("quadForm computes J^T H J") {
    val df = Seq((1.0, 2.0, 3.0, 1.0, -1.0))
      .toDF("jac_1", "jac_2", "hess_1_1", "hess_1_2", "hess_2_2")
    // J=(1,2), H=[[3,1],[1,-1]] -> JtHJ = 3 + 2*2 + 4*(-1) = 3
    val got = df.select(Derivatives.quadForm(2).as("q")).as[Double].head()
    assert(math.abs(got - 3.0) < 1e-12)
    val n = df.select(Derivatives.jacNormSq(2).as("n")).as[Double].head()
    assert(math.abs(n - 5.0) < 1e-12)
  }

  test("KDE piecewise derivative matches grid slopes with edge clamping") {
    val r = KdeResult(0.0, 1.0, 3, 1.0, Array(0.0, 1.0, 0.5))
    val got = Seq(-0.5, 0.25, 0.75, 2.0).toDF("y")
      .select(r.derivative(col("y")).as("d")).as[Double].collect().toSeq
    // step=0.5: slopes are (1-0)/.5=2 on [0,.5), (0.5-1)/.5=-1 on [.5,1]; clamped outside
    assert(got == Seq(2.0, 2.0, -1.0, -1.0))
  }

  test("us_lgw acquisition is finite, nonnegative, and dispatchable") {
    val model = scorer.fit(pool)
    val scored = model.score(pool)
    val jh = Derivatives.jacobianHessian(scored, model, Seq("x1", "x2"), h = 1e-4)
    val predKde = Kde.fit(scored, col("pred"), gridSize = 64)
    val w = jh.withColumn("acq", Acquisition.byName("us_lgw", Some(predKde), Some(2)))
      .select("acq").as[Double].collect()
    assert(w.length == 3)
    assert(w.forall(v => !v.isNaN && !v.isInfinite && v >= 0))
  }
}
