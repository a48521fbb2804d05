package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline retrieval-evaluation metrics — the harness that turns the
  * engine's retrieval operators (BM25 q85/q89, ANN q64, RRF fusion q105)
  * into numbers a pipeline can gate on: nDCG@k, MRR, recall@k,
  * precision@k per query, from a ranked-results frame and a graded
  * relevance-judgment frame (the standard TREC-style shape).
  *
  * Scale shape: both inputs hash-partition by `qid`; the top-k truncation
  * is a per-qid window over ≤k rows after an early `rank <= k` filter, the
  * ideal-DCG ranking is a per-qid window over the judgments, and the final
  * aggregate is one groupBy(qid) — so the whole evaluation is two
  * qid-keyed shuffles regardless of corpus size, and a million-query eval
  * parallelizes perfectly. No driver materialization.
  */
object RankingMetrics {

  private val log2e = log(lit(2.0)) // ln 2; gains divide ln(pos+1)/ln 2

  /** Gain of a graded judgment at 1-based position `pos`:
    * (2^grade − 1) / log2(pos + 1). */
  private def dcgTerm(grade: Column, pos: Column): Column =
    (pow(lit(2.0), grade) - 1) / (log(pos + 1) / log2e)

  /** Evaluate ranked results against graded judgments at cutoff `k`.
    *
    * `ranked`: one row per (qid, doc) retrieval hit with a 1-based `rank`
    * column (ties must already be broken — ranks unique per qid).
    * `judgments`: one row per (qid, doc) with `grade > 0` (unjudged docs
    * are simply absent = grade 0).
    *
    * Output per qid: `ndcg` (DCG@k over ideal-DCG@k, 0 when the query has
    * no judged-relevant docs), `mrr` (1/rank of the highest-ranked
    * relevant hit anywhere in the ranking — not capped at k, the classic
    * definition), `recall_k` (judged docs found in the top k over n_rel —
    * the standard uncapped denominator), `precision_k` (relevant hits in
    * top k over k), `n_rel`. All metric columns rounded to 6
    * (engine-portable, q108 convention). */
  def evalAtK(ranked: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val hits = ranked.select(col("qid"), col("doc_id"), col("rank").cast("long"))
      .join(judgments.select(col("qid"), col("doc_id"),
        col("grade").cast("double")), Seq("qid", "doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0.0)))

    // realized DCG@k and hit counts from the top-k slice
    val realized = hits.filter(col("rank") <= k)
      .groupBy("qid").agg(
        sum(when(col("grade") > 0, dcgTerm(col("grade"), col("rank")))
          .otherwise(lit(0.0))).as("dcg"),
        sum(when(col("grade") > 0, 1L).otherwise(0L)).as("hits_k"))

    // MRR over the FULL ranking (not k-capped)
    val mrr = hits.filter(col("grade") > 0)
      .groupBy("qid").agg((lit(1.0) / min(col("rank"))).as("mrr"))

    // ideal DCG@k: judgments ranked by grade desc (doc_id tiebreak —
    // same-grade order does not change the sum, but a total order keeps
    // the per-qid window deterministic)
    val iw = Window.partitionBy("qid").orderBy(col("grade").desc, col("doc_id"))
    val ideal = judgments.filter(col("grade") > 0)
      .withColumn("ipos", row_number().over(iw))
      .groupBy("qid").agg(
        sum(when(col("ipos") <= k, dcgTerm(col("grade"), col("ipos")))
          .otherwise(lit(0.0))).as("idcg"),
        count(lit(1)).as("n_rel"))

    ranked.select("qid").distinct()
      .join(realized, Seq("qid"), "left")
      .join(mrr, Seq("qid"), "left")
      .join(ideal, Seq("qid"), "left")
      .select(col("qid"),
        round(when(coalesce(col("idcg"), lit(0.0)) > 0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg")).otherwise(0.0), 6).as("ndcg"),
        round(coalesce(col("mrr"), lit(0.0)), 6).as("mrr"),
        round(when(coalesce(col("n_rel"), lit(0L)) > 0,
          coalesce(col("hits_k"), lit(0L)).cast("double") / col("n_rel"))
          .otherwise(0.0), 6).as("recall_k"),
        round(coalesce(col("hits_k"), lit(0L)).cast("double") / k, 6).as("precision_k"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"))
  }
}
