package graft.pipelines

import graft.functions.Pdfs
import graft.ml.{Scorer, ScorerModel}
import graft.operators.{Integrate, Kde, Selection}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-iteration convergence metrics — the reference's measurement stage
  * (`BigDataQualityAssessment_ActiveSampling.py:186-219`). */
case class IterationMetrics(iter: Int, mse: Double, meanVar: Double,
                            logPdfError: Double, trainSize: Long, poolSize: Long)

case class ActiveSamplingConfig(
    initSize: Int = 100,
    iterations: Int = 20,
    seed: Long = 42,
    kdeGridSize: Int = 1024,
    kdeBandwidth: Option[Double] = None,
    logPdfClip: Double = -6.0,
    checkpointEvery: Int = 5)

/** The flagship pipeline: Bayesian active sampling over a labeled pool —
  * the reference's main driver re-expressed as immutable DataFrame
  * transitions (`BigDataQualityAssessment_ActiveSampling.py:183-278`,
  * SURVEY.md §3.1).
  *
  * Each iteration is a pure function (train, pool, model) → (train', pool',
  * model'): score the pool once, run the three explorers (SE = squared
  * error, US = uncertainty, US-LW = likelihood-weighted uncertainty) as
  * top-1 select-and-moves over the SAME cached scored pool (one scan powers
  * all three — the fusion the reference does by reusing arrays), then refit.
  *
  * Scale notes: the scored pool is cached per iteration and localCheckpointed
  * every `checkpointEvery` iterations to cut union+anti-join lineage growth
  * (SURVEY.md §7 risk list); every selection is TakeOrderedAndProject + a
  * broadcast anti-join, so iteration cost is O(one pool scan).
  */
object ActiveSampling {

  /** df must carry: id (long, unique), feature columns, y (double). */
  def run(spark: SparkSession, df: DataFrame, scorer: Scorer,
          cfg: ActiveSamplingConfig = ActiveSamplingConfig()): (DataFrame, Seq[IterationMetrics]) = {
    import spark.implicits._

    val pool0 = df.localCheckpoint()

    // stage 1-2: KDE density profile of y → inverse-density weighted init
    // sample (reference :34-56)
    val yKde = Kde.fit(pool0, col("y"), gridSize = cfg.kdeGridSize,
      bandwidth = cfg.kdeBandwidth)
    val weighted = pool0.withColumn("__w",
      lit(1.0) / greatest(yKde.interpolate(col("y")), lit(1e-12)))
    val init = Selection.weightedSample(weighted, col("__w"), cfg.initSize, cfg.seed)
      .drop("__w").withColumn("explorer", lit("init"))

    var train = init.localCheckpoint()
    var pool = Selection.removeById(pool0, train, "id").localCheckpoint()
    var model: ScorerModel = scorer.fit(train)

    // the true-density grid for the log-pdf-error metric (reference :199-219)
    val trueKde = yKde

    val metrics = (1 to cfg.iterations).map { it =>
      val scored = model.score(pool).cache()

      // 4a: convergence metrics over the full scored pool (reference :186-219)
      val m = scored.agg(
        avg(pow(col("pred") - col("y"), 2)).as("mse"),
        avg(col("var")).as("mvar")).head()
      val predKde = Kde.fit(scored, col("pred"), gridSize = cfg.kdeGridSize,
        bandwidth = cfg.kdeBandwidth,
        bounds = Some((trueKde.gridMin, trueKde.gridMax)))
      val gridDf = trueKde.toDF(spark).withColumnRenamed("pdf", "p_true")
        .withColumn("p_pred", predKde.interpolate(col("grid_x")))
      val logDiff = gridDf.select(col("grid_x"),
        abs(Pdfs.clipLower(log(greatest(col("p_pred"), lit(1e-300))), cfg.logPdfClip) -
            Pdfs.clipLower(log(greatest(col("p_true"), lit(1e-300))), cfg.logPdfClip)).as("d"))
        .filter(Pdfs.isFinite(col("d")))
      val logPdfErr = Integrate.trapz(logDiff, col("grid_x"), col("d"))
        .head().getDouble(0)

      // 4b-4d: three explorers off the same scored scan (reference :222-269)
      val usLwScore = (lit(1.0) / greatest(predKde.interpolate(col("pred")), lit(1e-12))) * col("var")
      val (p1, t1, _) = Selection.selectAndMove(scored, train,
        pow(col("pred") - col("y"), 2), 1, "id", "se", Seq(col("id")))
      val (p2, t2, _) = Selection.selectAndMove(p1, t1, col("var"), 1, "id", "us", Seq(col("id")))
      val (p3, t3, _) = Selection.selectAndMove(p2, t2, usLwScore, 1, "id", "us_lw", Seq(col("id")))

      val dropCols = Seq("pred", "var")
      pool = p3.drop(dropCols: _*)
      train = t3.drop(dropCols: _*)
      if (it % cfg.checkpointEvery == 0) {
        pool = pool.localCheckpoint()
        train = train.localCheckpoint()
      }
      scored.unpersist()

      // 4e: refit on the grown train set (reference :271-273)
      model = scorer.fit(train)

      IterationMetrics(it, m.getDouble(0), m.getDouble(1), logPdfErr,
        train.count(), pool.count())
    }

    (train, metrics)
  }

  /** Metrics as a DataFrame (the reference's convergence-curve output,
    * S7 sink replacement). */
  def metricsDF(spark: SparkSession, ms: Seq[IterationMetrics]): DataFrame = {
    import spark.implicits._
    ms.toDF()
  }
}
