package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vectors: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    (0L until 60L).map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
  }
  private lazy val df = vectors.toDF("vec_id", "embedding")

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  test("bruteForceTopK matches naive exact computation") {
    val queries = df.filter(col("vec_id") < 3)
    val got = Ann.bruteForceTopK(df, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    for (q <- 0L until 3L) {
      val qv = vectors(q.toInt)._2
      val expected = vectors.map { case (id, v) => (id, cosine(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      assert(got(q) == expected, s"query $q: got ${got(q)}, want $expected")
    }
    // self is always rank 1 with score 1
    assert((0L until 3L).forall(q => got(q).head == q))
  }

  test("TopKAggregator keeps k best with tie-break on smaller id") {
    val data = Seq(ScoredId(1.0, 5L), ScoredId(1.0, 2L), ScoredId(0.5, 1L),
      ScoredId(2.0, 9L), ScoredId(0.1, 0L))
    val agg = new TopKAggregator(3)
    val buf = data.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf)
    assert(out.map(_.id) == Seq(9L, 2L, 5L))
    // merge of split halves gives same answer
    val (l, r) = data.splitAt(2)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(merged.map(_.id) == Seq(9L, 2L, 5L))
  }

  test("ivfTopK recall@5 vs brute force is reasonable on fixture embeddings") {
    val e = graft.Tables.embeddings(spark, sf001)
    val queries = e.filter(col("vec_id") < 10)
    def neighborSets(res: org.apache.spark.sql.DataFrame) = res
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = neighborSets(Ann.bruteForceTopK(e, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k = 5))
    val approx = neighborSets(Ann.ivfTopK(e, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k = 5, nlist = 8, nprobe = 3))
    val recalls = exact.keys.toSeq.map { q =>
      approx.get(q).map(a => (a & exact(q)).size.toDouble / exact(q).size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@5 = $mean (want >= 0.5 at nprobe=3/8)")
  }

  test("ivfTopK returns self as top hit and plausible neighbors") {
    val queries = df.filter(col("vec_id") < 3)
    val got = Ann.ivfTopK(df, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5, nlist = 4, nprobe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for (q <- 0L until 3L) {
      assert(got(q).nonEmpty && got(q).head == q,
        s"query $q should find itself first: ${got.get(q)}")
    }
  }
}
