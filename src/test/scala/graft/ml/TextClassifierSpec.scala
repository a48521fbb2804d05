package graft.ml

import graft.SparkSpec
import graft.functions.TextOps
import org.apache.spark.sql.functions._

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // 200 docs, linearly separable label: 1 iff "good" count >= "bad" count.
  // Filler tokens force the model to learn the signal, not memorize rows.
  private def corpus = {
    val rnd = new scala.util.Random(7)
    val filler = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (0 until 200).map { i =>
      val nGood = rnd.nextInt(4)
      val nBad = rnd.nextInt(4)
      val words = new scala.util.Random(i)
        .shuffle(List.fill(nGood)("good") ++ List.fill(nBad)("bad") ++
          List.fill(6)(filler(rnd.nextInt(filler.size))))
      (i.toLong, words.mkString(" "), if (nGood >= nBad) 1 else 0)
    }.toDF("doc_id", "text", "y")
  }

  test("holdoutGate recovers a linearly separable planted label") {
    val out = TextClassifier.holdoutGate(corpus, col("doc_id"),
        TextOps.tokens(col("text")), col("y"), accThreshold = 0.9)
      .as[(Long, Long, Long, Long)].head()
    assert(out._1 == 200L, s"n_docs: $out")
    assert(out._2 + out._3 == 200L, s"folds don't partition: $out")
    assert(out._4 == 1L, s"holdout accuracy below gate: $out")
  }

  test("maxTrainFrac subsamples training but reports the full fold size") {
    val full = TextClassifier.holdoutGate(corpus, col("doc_id"),
        TextOps.tokens(col("text")), col("y"), accThreshold = 0.85)
      .as[(Long, Long, Long, Long)].head()
    val sampled = TextClassifier.holdoutGate(corpus, col("doc_id"),
        TextOps.tokens(col("text")), col("y"), accThreshold = 0.85,
        maxTrainFrac = 0.5)
      .as[(Long, Long, Long, Long)].head()
    assert(sampled._2 == full._2, "n_train must report the fold, not the sample")
    assert(sampled._4 == 1L, s"half-sample training lost the gate: $sampled")
  }

  test("score emits calibrated-direction probabilities") {
    val feat = TextClassifier.featurize(corpus, col("doc_id"),
      TextOps.tokens(col("text")), col("y"))
    val model = TextClassifier.train(feat)
    val scored = TextClassifier.score(model, feat)
    // mean P(1) among true-1 docs must exceed mean P(1) among true-0 docs
    val (p1, p0) = scored.agg(
        avg(when(col("label") === 1.0, col("p1"))),
        avg(when(col("label") === 0.0, col("p1"))))
      .as[(Double, Double)].head()
    assert(p1 > p0 + 0.3, s"probabilities not separating: p1=$p1 p0=$p0")
  }
}
