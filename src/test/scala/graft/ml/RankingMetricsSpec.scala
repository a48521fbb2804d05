package graft.ml

import graft.SparkSpec

class RankingMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("evalAtK matches hand-computed nDCG/MRR/recall/precision") {
    // q1: docs ranked [30, 99, 10, 20]; judged 10->2, 20->1, 30->3; k=2
    // q2: ranked but nothing judged
    // q3: judged doc never retrieved
    // q4: only relevant doc sits BEYOND k (MRR counts it, recall@k doesn't)
    val ranked = Seq(
      (1L, 30L, 1L), (1L, 99L, 2L), (1L, 10L, 3L), (1L, 20L, 4L),
      (2L, 5L, 1L), (2L, 6L, 2L),
      (3L, 5L, 1L), (3L, 6L, 2L),
      (4L, 1L, 1L), (4L, 2L, 2L), (4L, 3L, 3L)
    ).toDF("qid", "doc_id", "rank")
    val judged = Seq(
      (1L, 10L, 2.0), (1L, 20L, 1.0), (1L, 30L, 3.0),
      (3L, 7L, 1.0),
      (4L, 3L, 1.0)
    ).toDF("qid", "doc_id", "grade")

    val out = RankingMetrics.evalAtK(ranked, judged, k = 2)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))

    // q1: DCG@2 = (2^3-1)/log2(2) = 7; IDCG@2 = 7 + (2^2-1)/log2(3)
    val idcg1 = 7.0 + 3.0 / log2(3.0)
    val exp1 = BigDecimal(7.0 / idcg1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) == ((1L, exp1, 1.0, 0.333333, 0.5, 3L)), out(0).toString)
    assert(out(1) == ((2L, 0.0, 0.0, 0.0, 0.0, 0L)), out(1).toString)
    assert(out(2) == ((3L, 0.0, 0.0, 0.0, 0.0, 1L)), out(2).toString)
    // q4: relevant at rank 3 with k=2 -> ndcg 0, mrr 1/3, recall 0
    assert(out(3) == ((4L, 0.0, 0.333333, 0.0, 0.0, 1L)), out(3).toString)
  }

  test("perfect ranking scores ndcg 1 and full recall") {
    val ranked = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("qid", "doc_id", "rank")
    val judged = Seq((1L, 10L, 3.0), (1L, 20L, 2.0), (1L, 30L, 1.0))
      .toDF("qid", "doc_id", "grade")
    val r = RankingMetrics.evalAtK(ranked, judged, k = 3).collect()(0)
    assert(r.getDouble(1) == 1.0) // ndcg
    assert(r.getDouble(2) == 1.0) // mrr
    assert(r.getDouble(3) == 1.0) // recall
    assert(r.getDouble(4) == 1.0) // precision
  }

  test("scores the engine's own BM25 top-k against containment judgments") {
    val docs = Seq(
      (1L, "spark shuffles data across executors"),
      (2L, "spark spark spark tuning guide"),
      (3L, "ducks swim in the pond"),
      (4L, "the spark of an idea"),
      (5L, "completely unrelated text")
    ).toDF("doc_id", "text")
    val top = graft.operators.Retrieval.bm25TopK(docs,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("text"), " "),
      Seq("spark"), k = 4)
    // adapt (doc_id, bm25 score) to the ranked shape
    val ranked = top.withColumn("qid", org.apache.spark.sql.functions.lit(0L))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(org.apache.spark.sql.functions.col("bm25").desc,
            org.apache.spark.sql.functions.col("doc_id"))))
      .select("qid", "doc_id", "rank")
    val judged = Seq((0L, 1L, 1.0), (0L, 2L, 2.0), (0L, 4L, 1.0))
      .toDF("qid", "doc_id", "grade")
    val r = RankingMetrics.evalAtK(ranked, judged, k = 3).collect()(0)
    assert(r.getLong(5) == 3L)
    assert(r.getDouble(3) == 1.0, s"recall: $r") // all 3 spark docs in top 3
    assert(r.getDouble(1) > 0.85, s"ndcg: $r")   // tf-heaviest doc ranks first
  }
}
