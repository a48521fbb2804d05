package graft.operators

import graft.SparkSpec
import graft.ml.Acquisition
import org.apache.spark.sql.functions._

class SourcesPcaSpec extends SparkSpec {
  import spark.implicits._

  test("grid source: n^d lattice with exact bounds and unique ids") {
    val g = Sources.grid(spark, Domain(Seq((-1.0, 1.0), (0.0, 2.0))), 5)
    assert(g.count() == 25)
    assert(g.select(count_distinct(col("id"))).head().getLong(0) == 25)
    val r = g.agg(min("x1"), max("x1"), min("x2"), max("x2")).head()
    assert(r.getDouble(0) == -1.0 && r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 2.0)
    // lattice spacing exact
    val x1s = g.select("x1").distinct().as[Double].collect().sorted
    assert(x1s.length == 5 && math.abs(x1s(1) - x1s(0) - 0.5) < 1e-12)
  }

  test("uniform source stays in domain, deterministic under seed") {
    val d = Domain(Seq((2.0, 3.0)))
    val a = Sources.uniform(spark, d, 500, 7).select("x1").as[Double].collect()
    val b = Sources.uniform(spark, d, 500, 7).select("x1").as[Double].collect()
    assert(a.sameElements(b))
    assert(a.forall(x => x >= 2.0 && x < 3.0))
  }

  test("latin hypercube: one sample per stratum per dimension") {
    val n = 32
    val lhs = Sources.latinHypercube(spark, Domain(Seq((0.0, 1.0), (0.0, 1.0))), n, 42)
    val strata1 = lhs.select(floor(col("x1") * n).cast("int").as("s")).distinct().count()
    val strata2 = lhs.select(floor(col("x2") * n).cast("int").as("s")).distinct().count()
    assert(strata1 == n && strata2 == n)
  }

  test("gaussian source matches target mean/cov approximately") {
    val mu = Seq(1.0, -2.0)
    val cov = Seq(Seq(2.0, 0.8), Seq(0.8, 1.0))
    val g = Sources.gaussian(spark, mu, cov, 20000, 11)
    val r = g.agg(avg("x1"), avg("x2"), var_pop("x1"), var_pop("x2"),
      covar_pop("x1", "x2")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 0.05)
    assert(math.abs(r.getDouble(1) + 2.0) < 0.05)
    assert(math.abs(r.getDouble(2) - 2.0) < 0.15)
    assert(math.abs(r.getDouble(3) - 1.0) < 0.1)
    assert(math.abs(r.getDouble(4) - 0.8) < 0.1)
  }

  test("PCA recovers the dominant axis of an elongated cloud") {
    val rnd = new scala.util.Random(3)
    // points along direction (1,1) with small orthogonal noise
    val pts = Seq.fill(2000) {
      val t = rnd.nextGaussian() * 5
      val e = rnd.nextGaussian() * 0.3
      (t + e, t - e)
    }
    val df = pts.toDF("a", "b")
    val model = Pca.fit(df, Seq("a", "b"), 2)
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1))
    // first component ~ (1,1)/sqrt(2) up to sign
    val c = model.components.map(_(0))
    assert(math.abs(math.abs(c(0)) - math.abs(c(1))) < 0.05)
    // projection de-means: pc1 mean ~ 0
    val m = Pca.project(df, Seq("a", "b"), model).agg(avg("pc1")).head().getDouble(0)
    assert(math.abs(m) < 1e-9)
  }

  test("PCA is stable under a huge mean offset (centered two-pass covariance)") {
    // |mean| / stddev ~ 1e8: the one-pass raw-sums covariance loses most
    // significant digits here; the centered form must still recover the
    // same eigenstructure as the zero-mean cloud.
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(2000) {
      val t = rnd.nextGaussian() * 5
      val e = rnd.nextGaussian() * 0.3
      (t + e, t - e)
    }
    val off = 1.0e8
    val base = Pca.fit(pts.toDF("a", "b"), Seq("a", "b"), 2)
    val shifted = Pca.fit(
      pts.map { case (a, b) => (a + off, b + off) }.toDF("a", "b"),
      Seq("a", "b"), 2)
    for (j <- 0 until 2)
      assert(math.abs(shifted.eigenvalues(j) - base.eigenvalues(j))
        <= 1e-4 * math.max(base.eigenvalues(0), 1.0),
        s"eigenvalue $j drifted: ${shifted.eigenvalues(j)} vs ${base.eigenvalues(j)}")
    val c = shifted.components.map(_(0))
    assert(math.abs(math.abs(c(0)) - math.abs(c(1))) < 0.05)
  }

  test("acquisition dispatch mirrors the reference API") {
    val scored = Seq((1L, 0.5, 0.1), (2L, 0.2, 0.9)).toDF("id", "pred", "var")
    val top = Selection.argmax(scored, Acquisition.byName("us"))
    assert(top.select("id").as[Long].head() == 2L)
    intercept[IllegalArgumentException] { Acquisition.byName("us_lgw") }
    intercept[IllegalArgumentException] { Acquisition.byName("us_lw") }
  }
}
