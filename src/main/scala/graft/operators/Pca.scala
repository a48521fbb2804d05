package graft.operators

import org.apache.spark.mllib.linalg.{Vectors => MlVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
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
  * Executor-side: centering projection + the distributed Gram/covariance
  * accumulation inside RowMatrix; driver-side: the tiny d×d eigensolve —
  * the same split as the reference's in-process LAPACK call, but the O(n·d²)
  * part distributes. Projection back onto the basis is a codegen'd column
  * expression (no UDF).
  */
object Pca {

  def fit(df: DataFrame, cols: Seq[String], k: Int): PcaModel = {
    val meansRow = df.select(cols.map(c => avg(col(c))): _*).head()
    val means = cols.indices.map(meansRow.getDouble).toArray
    val centered = df.select(cols.zipWithIndex.map { case (c, i) =>
      (col(c) - lit(means(i))).as(c)
    }: _*)
    val rows = centered.rdd.map { r =>
      MlVectors.dense(cols.indices.map(i => r.getDouble(i)).toArray)
    }
    val mat = new RowMatrix(rows)
    val kEff = math.min(k, cols.size)
    val svd = mat.computeSVD(kEff, computeU = false)
    // eigenvalues of covariance = s^2 / (n-1); svd.s is descending already
    val n = mat.numRows().toDouble
    val eig = svd.s.toArray.map(s => s * s / math.max(n - 1, 1))
    val comp = Array.tabulate(cols.size, kEff)((i, j) => svd.V(i, j))
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
