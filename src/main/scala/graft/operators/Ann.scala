package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregate over (score, id) pairs. Buffer = ascending-sorted
  * vector capped at k, so `groupBy(query).agg(topK)` does map-side partial
  * top-k per partition and shuffles at most k rows per (partition, query) —
  * the shape that makes brute-force scoring of a 100 TB corpus against Q
  * queries a single scan + tiny exchange, instead of a window over a
  * corpus×Q shuffle. */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0)
  def zero: Seq[ScoredId] = Vector.empty

  private def insert(buf: Seq[ScoredId], s: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ s).sortBy(x => (x.score, -x.id))
    else if (s.score > buf.head.score ||
             (s.score == buf.head.score && s.id < buf.head.id))
      (buf.tail :+ s).sortBy(x => (x.score, -x.id))
    else buf

  def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = insert(buf, in)
  def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = b.foldLeft(a)(insert)
  def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf.reverse
  def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
  def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}

/** Approximate / exact nearest-neighbor search over an embedding column. */
object Ann {

  /** Brute-force cosine top-k: every (query, corpus) pair is scored in one
    * projection over the corpus scan (queries ride along as a broadcast
    * cross join — Q rows), then [[TopKAggregator]] reduces to k neighbors
    * per query with map-side combine. Exact; the baseline the approximate
    * variants are judged against.
    *
    * Output: (query_id, rank, neighbor_id, score).
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(corpusId.cast("long").as("nid"),
      corpusVec.cast("array<double>").as("cv"))
    val q = queries.select(queryId.cast("long").as("query_id"),
      queryVec.cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("nid"),
        VectorOps.cosine(col("cv"), col("qv")).as("score"))
    topKFromScores(scored, k)
  }

  /** groupBy(query).agg(TopKAggregator) + explode to ranked rows
    * (query_id, rank, neighbor_id, score). The udaf takes the flattened
    * (score, id) input pair. */
  private def topKFromScores(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    scored
      .groupBy("query_id")
      .agg(topk(col("score"), col("nid")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("rank0", "n")))
      .select(col("query_id"), (col("rank0") + 1).cast("long").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.score"), 6).as("score"))
  }

  /** IVF-style ANN: partition the corpus into `nlist` Voronoi cells around
    * sampled centroids (cell id = argmax dot with a literal centroid matrix
    * — pure codegen expression), then scan only the `nprobe` cells nearest
    * each query. The cell column is computed once (in practice: persisted /
    * partitioned-by at ingest), so each query touches nprobe/nlist of the
    * data — the standard recall/throughput dial.
    */
  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42,
              refineIters: Int = 1): DataFrame = {
    val c = corpus.select(corpusId.cast("long").as("nid"),
      corpusVec.cast("array<double>").as("cv"))
    // centroids: deterministic sample of nlist corpus vectors (kmeans init),
    // then `refineIters` Lloyd steps — each step is one distributed
    // assignment pass + a posexplode/groupBy mean (nlist x dim rows back to
    // the driver). Tighter cells raise recall at the same nprobe.
    var cents: Array[Array[Double]] = c.select(col("cv"))
      .orderBy(xxhash64(col("nid"), lit(seed)))
      .limit(nlist).collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to refineIters) {
      val centArr0 = typedLit(cents.map(_.toSeq).toSeq)
      val cell0 = array_max(transform(centArr0, (ct, i) =>
        struct(VectorOps.cosine(col("cv"), ct).as("s"), i.as("cell")))).getField("cell")
      val means = c.select(col("cv"), cell0.as("cell"))
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .collect()
      val dim = cents(0).length
      val refined = cents.map(_.clone())
      means.foreach { r =>
        refined(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) = r.getAs[Double]("m")
      }
      cents = refined
    }
    // NB: ONE transform lambda over a 2-D centroid literal — the cosine body
    // is planned/compiled once, not nlist times (and never as a pairwise
    // when/otherwise reduce, which would duplicate subtrees exponentially).
    val centArr = typedLit(cents.map(_.toSeq).toSeq)
    def scoredCells(vec: Column): Column =
      transform(centArr, (c, i) =>
        struct(VectorOps.cosine(vec, c).as("s"), i.as("cell")))
    def cellOf(vec: Column): Column = array_max(scoredCells(vec)).getField("cell")
    def probesOf(vec: Column): Column =
      slice(reverse(array_sort(scoredCells(vec))), 1, nprobe).getField("cell")
    val cc = c.withColumn("cell", cellOf(col("cv")))
    val q = queries.select(queryId.cast("long").as("query_id"),
        queryVec.cast("array<double>").as("qv"))
      .withColumn("cell", explode(probesOf(col("qv"))))
    val scored = cc.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("nid"),
        VectorOps.cosine(col("cv"), col("qv")).as("score"))
    topKFromScores(scored, k)
  }
}
