package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GmmSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated planted Gaussian blobs (Box–Muller over LCG —
    * deterministic, no Random). */
  private lazy val planted = {
    var s = 0xDEADBEEFL
    def lcg(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) + 1e-12
    }
    def gauss(): Double =
      math.sqrt(-2.0 * math.log(lcg())) * math.cos(2 * math.Pi * lcg())
    val rows = (0 until 2000).map { i =>
      if (i % 4 == 0) (i.toLong, 20.0 + 1.5 * gauss(), -5.0 + 0.5 * gauss())  // 25%
      else (i.toLong, -10.0 + 1.0 * gauss(), 8.0 + 2.0 * gauss())             // 75%
    }
    rows.toDF("id", "a", "b").localCheckpoint()
  }

  test("fitDiag recovers a planted 2-component mixture") {
    val m = Gmm.fitDiag(planted, Seq("a", "b"), k = 2, iters = 12,
      keyCols = Seq(col("id")))
    // identify components by their `a` mean
    val (hi, lo) = if (m.means(0)(0) > m.means(1)(0)) (0, 1) else (1, 0)
    assert(math.abs(m.means(hi)(0) - 20.0) < 0.5, m.means(hi).mkString(","))
    assert(math.abs(m.means(hi)(1) - -5.0) < 0.5)
    assert(math.abs(m.means(lo)(0) - -10.0) < 0.5)
    assert(math.abs(m.means(lo)(1) - 8.0) < 0.5)
    assert(math.abs(m.weights(hi) - 0.25) < 0.03, m.weights.mkString(","))
    assert(math.abs(m.weights(lo) - 0.75) < 0.03)
    assert(math.abs(m.vars(hi)(0) - 2.25) < 0.7, m.vars(hi).mkString(","))
    assert(math.abs(m.vars(lo)(1) - 4.0) < 0.9)
  }

  test("assign puts planted points with their component") {
    val m = Gmm.fitDiag(planted, Seq("a", "b"), k = 2, iters = 12,
      keyCols = Seq(col("id")))
    val assigned = Gmm.assign(planted, Seq("a", "b"), m)
    // id % 4 == 0 rows form one component, the rest the other; allow a
    // handful of boundary strays
    val confusion = assigned
      .groupBy((col("id") % 4 === 0).cast("int").as("truth"), col("component"))
      .count().collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val comp0 = confusion.collect { case ((1, c), n) => c -> n }.maxBy(_._2)._1
    val right = confusion.getOrElse((1, comp0), 0L) +
      confusion.collect { case ((0, c), n) if c != comp0 => n }.sum
    assert(right >= 1990, s"confusion: $confusion")
  }

  test("fitDiag is deterministic run-to-run") {
    val m1 = Gmm.fitDiag(planted, Seq("a", "b"), k = 3, iters = 3, keyCols = Seq(col("id")))
    val m2 = Gmm.fitDiag(planted, Seq("a", "b"), k = 3, iters = 3, keyCols = Seq(col("id")))
    assert(m1.weights.toSeq == m2.weights.toSeq)
    assert(m1.means.flatten[Double].toSeq == m2.means.flatten[Double].toSeq)
    assert(m1.vars.flatten[Double].toSeq == m2.vars.flatten[Double].toSeq)
  }

  test("renormalize makes the weights an exact probability vector") {
    // raw weights can sum slightly under 1 (rows whose density rounds to
    // zero under every component carry no M-step mass — documented
    // approximation); the flag renormalizes driver-side
    val raw = Gmm.fitDiag(planted, Seq("a", "b"), k = 2, iters = 12,
      keyCols = Seq(col("id")))
    val rn = Gmm.fitDiag(planted, Seq("a", "b"), k = 2, iters = 12,
      keyCols = Seq(col("id")), renormalize = true)
    assert(rn.weights.sum == 1.0, rn.weights.mkString(","))
    // only the weights change — means/vars are the oracle-replayed values
    assert(rn.means.flatten[Double].toSeq == raw.means.flatten[Double].toSeq)
    assert(rn.vars.flatten[Double].toSeq == raw.vars.flatten[Double].toSeq)
    // renormalization preserves the weight RATIOS
    assert(math.abs(rn.weights(0) / rn.weights(1) -
      raw.weights(0) / raw.weights(1)) < 1e-12)
  }

  test("degenerate component variance is floored, not collapsed") {
    // 50 identical points plus one outlier: a component that captures the
    // spike must keep variance >= varFloor
    val df = ((0 until 50).map(i => (i.toLong, 5.0)) :+ (99L, 500.0))
      .toDF("id", "a")
    val m = Gmm.fitDiag(df, Seq("a"), k = 2, iters = 8, keyCols = Seq(col("id")))
    assert(m.vars.flatten.forall(_ >= 1e-6))
    // the outlier's density rounds to zero under every component (the
    // score-12 fence), so its mass drops out of the M-step: weights sum to
    // 50/51, the documented underflow-row contract
    assert(m.weights.sum > 0.95 && m.weights.sum <= 1.0 + 1e-9)
  }

  test("fixDimGmm normalizes every covariance shape to k full matrices") {
    val k = 2; val d = 3
    val full = Array.fill(k)(Array.tabulate(d, d)((i, j) => (i * d + j).toDouble))
    assert(Gmm.fixDimGmm(Gmm.FullCov(full), k, d).map(_.flatten.toSeq).toSeq ==
      full.map(_.flatten.toSeq).toSeq)

    val tied = Array.tabulate(d, d)((i, j) => if (i == j) 2.0 else 0.5)
    val t = Gmm.fixDimGmm(Gmm.TiedCov(tied), k, d)
    assert(t.length == k)
    t.foreach(m => assert(m.flatten.toSeq == tied.flatten.toSeq))
    // replicas are independent copies
    t(0)(0)(0) = 99.0
    assert(t(1)(0)(0) == 2.0)

    val diag = Array(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))
    val dm = Gmm.fixDimGmm(Gmm.DiagCov(diag), k, d)
    for (c <- 0 until k; i <- 0 until d; j <- 0 until d)
      assert(dm(c)(i)(j) == (if (i == j) diag(c)(i) else 0.0))

    val sph = Array(7.0, 9.0)
    val sm = Gmm.fixDimGmm(Gmm.SphericalCov(sph), k, d)
    for (c <- 0 until k; i <- 0 until d; j <- 0 until d)
      assert(sm(c)(i)(j) == (if (i == j) sph(c) else 0.0))

    intercept[IllegalArgumentException](Gmm.fixDimGmm(Gmm.SphericalCov(Array(1.0)), k, d))
  }
}
