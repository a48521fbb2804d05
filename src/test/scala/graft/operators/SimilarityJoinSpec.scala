package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: all doc pairs, exact word-set Jaccard. */
  private def bruteForce(docs: DataFrame, t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.select(col("doc_id"),
        array_distinct(graft.functions.TextOps.tokens(
          graft.functions.TextOps.normalized(col("text")))).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter).toDouble
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= t
    } yield (ia, ib, jr)).toSet
  }

  private def run(docs: DataFrame, t: Double): Set[(Long, Long, Double)] =
    SimilarityJoin.allPairsJaccard(docs, col("doc_id"), col("text"), t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("equals brute force on a mixed fixture (dups, near-dups, empty, periodic)") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (3L, "completely different words about catalyst optimizer rules"),
      (4L, ""),                                            // empty set: no pairs
      (5L, "buy now buy now buy now buy now"),             // periodic: set {buy, now}
      (6L, "buy now buy now buy now buy now buy now"),     // same SET, different length
      (7L, "Punctuation, and CASE! should not matter: the quick brown fox jumps over the lazy dog.")
    ).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      assert(run(docs, t) == bruteForce(docs, t), s"threshold $t")
    }
  }

  test("complete on random corpora across thresholds (prefix filter drops nothing)") {
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = (0L until 60L).map { i =>
      val n = 1 + rnd.nextInt(8)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.25, 0.5, 0.75)) {
      assert(run(docs, t) == bruteForce(docs, t), s"threshold $t")
    }
  }

  test("deterministic under repartitioning") {
    val docs = Seq(
      (0L, "one two three four"), (1L, "one two three five"),
      (2L, "six seven eight"), (3L, "one two three four")
    ).toDF("doc_id", "text")
    val a = run(docs, 0.5)
    val b = run(docs.repartition(13), 0.5)
    assert(a == b && a.nonEmpty)
  }
}
