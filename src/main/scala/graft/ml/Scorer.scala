package graft.ml

import graft.functions.VectorOps
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{DecisionTreeRegressor, DecisionTreeRegressionModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable ensemble scorer — the reference's `UQ_NN` deep ensemble
  * (reference `core/ensemble_model.py:30-68`: N independently-trained models;
  * per-row prediction mean and POPULATION variance across members).
  *
  * The engine's semantics are fixed here — score(df) appends `pred` and
  * `var` columns — while the member model is pluggable: the reference's
  * Keras MLP has no spark.ml equivalent, so the idiomatic substitute is an
  * ensemble of tree regressors with different seeds (SURVEY.md §2.9 M1);
  * tests use [[AnalyticScorer]] to pin the engine behavior independent of
  * model internals.
  */
trait Scorer extends Serializable {
  /** Fit on (features..., y) and return a model-as-function. */
  def fit(train: DataFrame): ScorerModel
}

trait ScorerModel extends Serializable {
  /** Append `pred` (ensemble mean) and `var` (ensemble population variance)
    * to df. Must be a pure DataFrame transform (one projection — no
    * driver-side loops over rows). */
  def score(df: DataFrame): DataFrame
}

/** Deterministic scorer for tests and analytic demos: pred/var are given
  * column expressions (e.g. the true label + 0 variance, or a closed-form
  * surrogate). */
case class AnalyticScorer(predExpr: DataFrame => Column, varExpr: DataFrame => Column)
    extends Scorer {
  def fit(train: DataFrame): ScorerModel = new ScorerModel {
    def score(df: DataFrame): DataFrame =
      df.withColumn("pred", predExpr(df)).withColumn("var", varExpr(df))
  }
}

/** Ensemble of N decision-tree regressors with different seeds — the
  * spark.ml stand-in for the reference's N-member MLP ensemble
  * (`ensemble_model.py:44-55`). Mean and var_pop across members are computed
  * per row from the array of member predictions (`ensemble_model.py:59-68`),
  * as codegen'd array HOFs. */
case class TreeEnsembleScorer(featureCols: Seq[String], labelCol: String = "y",
                              n: Int = 2, maxDepth: Int = 8, seed: Long = 42)
    extends Scorer {
  def fit(train: DataFrame): ScorerModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
    val assembled = assembler.transform(train)
    val models: Seq[DecisionTreeRegressionModel] = (0 until n).map { i =>
      new DecisionTreeRegressor()
        .setFeaturesCol("__features").setLabelCol(labelCol)
        .setMaxDepth(maxDepth).setSeed(seed + i)
        // member diversity: bootstrap-ish via per-member minInstancesPerNode
        .setMinInstancesPerNode(1 + i)
        .fit(assembled)
    }
    new ScorerModel {
      def score(df: DataFrame): DataFrame = {
        val assembled = assembler.transform(df)
        val withPreds = models.zipWithIndex.foldLeft(assembled) { case (d, (m, i)) =>
          m.setPredictionCol(s"__p$i").transform(d)
        }
        val preds = array((0 until n).map(i => col(s"__p$i")): _*)
        withPreds
          .withColumn("pred", VectorOps.arrayMean(preds))
          .withColumn("var", VectorOps.arrayVarPop(preds))
          .drop((0 until n).map(i => s"__p$i") :+ "__features": _*)
      }
    }
  }
}
