package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — the "find me the documents about X"
  * query a curation team runs constantly (inspecting contamination hits,
  * pulling topical slices, eyeballing dedup clusters). Scoring is BM25
  * (Robertson–Spärck Jones family; the `(k1+1)` tf-saturation form and the
  * `ln(1 + (N-df+0.5)/(df+0.5))` non-negative idf are the public Lucene
  * convention).
  *
  * 100 TB shape — deliberately NOT an inverted index: for an ad-hoc query
  * over a parquet corpus the winning plan is two scans and zero joins.
  * Per-term tf comes from an array `filter` size (codegen'd projection —
  * the token array never explodes), corpus stats (N, avgdl, per-term df)
  * are ONE map-side-combined aggregate row broadcast back, and the top-k
  * is a `TakeOrderedAndProject` (k rows per partition cross the wire,
  * never the corpus). Query terms live in the plan as literals — nothing
  * resembling a dictionary structure is built or shuffled.
  */
object Retrieval {

  /** Top-k documents by BM25 over `terms` (deduplicated, order-stable).
    * Docs containing none of the terms never surface. Scores are rounded
    * to 6 decimals BEFORE the cut and tie-broken by doc_id, so the k-th
    * place is deterministic across engines and runs. Output:
    * (doc_id, bm25). Requires a corpus with at least one token. */
  def bm25TopK(df: DataFrame, id: Column, toks: Column, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "need at least one query term")
    require(k > 0, "k must be positive")
    val tfCols = ts.indices.map(i => s"__tf$i")
    val withTf = df.select(
      (id.cast("long").as("doc_id") +:
        size(toks).cast("double").as("__dl") +:
        ts.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("double").as(tfCols(i))
        }): _*)
    val statCols =
      count(lit(1)).cast("double").as("__n") +:
        avg(col("__dl")).as("__avgdl") +:
        ts.indices.map(i =>
          sum(when(col(tfCols(i)) > 0, 1L).otherwise(0L)).cast("double")
            .as(s"__df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))
    val score = ts.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      idf * col(tfCols(i)) * lit(k1 + 1.0) / (col(tfCols(i)) + norm)
    }.reduceLeft(_ + _)
    withTf.crossJoin(broadcast(stats))
      .filter(greatest(lit(0.0) +: tfCols.map(col): _*) > 0)
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }
}
