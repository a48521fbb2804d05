package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result of a PCA fit: eigenvalues (descending), principal components
  * (column-major, dim × k), per-column means used for centering. */
case class PcaModel(eigenvalues: Array[Double], components: Array[Array[Double]],
                    means: Array[Double]) {
  def k: Int = eigenvalues.length
}

/** PCA — the reference's `comp_pca` (`core/utils.py:7-40`: Gram-matrix
  * eigendecomposition, eigenvalues sorted descending, top n_trunc basis).
  *
  * Executor-side: a tiny first aggregate for n and per-column means, then
  * ONE codegen'd aggregate pass over sums of CENTERED products
  * (d(d+1)/2 scalars) — two passes instead of one, but numerically stable:
  * the one-pass raw-sums form cov = (E[xy]·n − sx·sy/n)/(n−1) is the
  * textbook catastrophic-cancellation formula when |mean| ≫ stddev;
  * driver-side: assemble the d×d covariance and eigensolve with breeze —
  * the same split as the reference's in-process LAPACK call, but the
  * O(n·d²) accumulation distributes with map-side combine and no RDD
  * row-object conversion. Sized for the reference's small d (2–15, d²
  * aggregate columns); for very wide d use mllib RowMatrix instead.
  * Projection back onto the basis is a codegen'd column expression (no
  * UDF).
  */
object Pca {

  def fit(df: DataFrame, cols: Seq[String], k: Int): PcaModel = {
    val d = cols.size
    // pass 1 (tiny): n + means
    val meanAggs = count(lit(1)).cast("double") +: cols.map(c => avg(col(c)))
    val m = df.agg(meanAggs.head, meanAggs.tail: _*).head()
    val n = m.getDouble(0)
    val means = Array.tabulate(d)(i => m.getDouble(1 + i))
    // pass 2: sums of centered products — no cancellation when |mean| >> sd
    val prodAggs = for (i <- 0 until d; j <- i until d)
      yield sum((col(cols(i)) - lit(means(i))) * (col(cols(j)) - lit(means(j))))
    val r = df.agg(prodAggs.head, prodAggs.tail: _*).head()
    val denom = math.max(n - 1, 1)
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      val c = r.getDouble(idx) / denom
      cov(i)(j) = c; cov(j)(i) = c
      idx += 1
    }
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(d, d, cov.flatten))
    // eigSym returns ascending eigenvalues; take the top k descending
    val kEff = math.min(k, d)
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(kEff)
    val eig = order.map(_._1)
    val comp = Array.tabulate(d, kEff)((i, j) => es.eigenvectors(i, order(j)._2))
    PcaModel(eig, comp, means)
  }

  /** Project rows onto the fitted basis: appends `pc1..pck` columns
    * (centered dot components) as pure expressions. */
  def project(df: DataFrame, cols: Seq[String], model: PcaModel): DataFrame =
    (0 until model.k).foldLeft(df) { case (d, j) =>
      val expr = cols.zipWithIndex.map { case (c, i) =>
        (col(c) - lit(model.means(i))) * lit(model.components(i)(j))
      }.reduce(_ + _)
      d.withColumn(s"pc${j + 1}", expr)
    }
}
