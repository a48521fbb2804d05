package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Corpus-wide frequent-token surface (vocabulary discovery, stopword
  * mining, boilerplate detection):
  *
  *   - [[exactTopK]]: exact counts via explode → two-level hash aggregate
  *     (map-side combine on (word) — the anchor, shuffles one row per
  *     distinct word).
  *   - [[MisraGries]]: the one-pass bounded-memory sketch — per-partition
  *     summaries of at most `capacity` counters, merged associatively.
  *     Guarantee: every token with true frequency > n/capacity survives,
  *     and each kept counter undercounts by at most n/capacity — so with
  *     capacity ≫ k the exact top-k is always a subset of the candidate
  *     set (re-count the candidates exactly in a second cheap pass to
  *     rank them). At 100 TB this replaces the full-vocabulary shuffle
  *     with a fixed-size map per partition.
  */
object HeavyHitters {

  /** Exact per-word counts: explode → two-level hash aggregate (map-side
    * combine; one shuffled row per distinct word). The total token count is
    * `sum(cnt)` over this result — derive it here rather than re-tokenizing
    * the corpus. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextOps.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Exact top-k tokens by count, ties broken by token ascending
    * (deterministic, SQL-mirrorable). */
  def exactTopK(df: DataFrame, text: Column, k: Int): DataFrame =
    wordCounts(df, text)
      .orderBy(desc("cnt"), col("word"))
      .limit(k)

  /** Misra-Gries summary aggregator over a token column: value = map of at
    * most `capacity` surviving tokens → lower-bound counts. */
  class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity > 0)

    override def zero: Map[String, Long] = Map.empty

    private def decrementAll(m: Map[String, Long], by: Long): Map[String, Long] =
      m.flatMap { case (w, c) => if (c > by) Some(w -> (c - by)) else None }

    override def reduce(m: Map[String, Long], w: String): Map[String, Long] =
      m.get(w) match {
        case Some(c) => m.updated(w, c + 1)
        case None if m.size < capacity => m.updated(w, 1L)
        case None => decrementAll(m, 1L)
      }

    /** Associative summary merge (Agarwal et al.'s mergeable-summaries
      * construction): add counts, then decrement all by the (capacity+1)-th
      * largest so at most `capacity` counters survive. */
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (combined.size <= capacity) combined
      else {
        val threshold = combined.values.toSeq.sorted(Ordering[Long].reverse)
          .apply(capacity)
        decrementAll(combined, threshold)
      }
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = m
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** One-pass candidate set: tokens that MAY have frequency > n/capacity.
    * Returns the summary map (≤ capacity entries) collected to the driver —
    * bounded by construction. */
  def misraGriesCandidates(df: DataFrame, text: Column,
                           capacity: Int): Map[String, Long] = {
    import df.sparkSession.implicits._
    val toks = df.select(explode(TextOps.tokens(text)).as("word")).as[String]
    toks.select(new MisraGries(capacity).toColumn).head()
  }
}
