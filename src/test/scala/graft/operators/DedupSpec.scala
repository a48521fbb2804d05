package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
    "while birds sing in the tall green trees under a bright morning sun"
  private val nearDup = base + " today"
  private val other = "completely different content about spark catalyst optimizer rules " +
    "predicate pushdown column pruning broadcast joins and shuffle partitions"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, other), (3L, base)
  ).toDF("doc_id", "text")

  test("exactByContent groups identical normalized docs") {
    val g = Dedup.exactByContent(docs, col("doc_id"), col("text"))
    val grp = g.filter(col("dups") === 2).collect()
    assert(grp.length == 1 && grp(0).getAs[Long]("keep_id") == 0L)
  }

  test("sortedIntersectSize equals size(array_intersect) on random sorted arrays") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.ArrayExprs.sortedIntersectSize(col("a"), col("b")).as("x"),
      size(array_intersect(col("a"), col("b"))).as("y"))
    assert(got.filter(col("x") =!= col("y")).count() == 0)
  }

  test("jaccardArrays exact") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val j = df.select(Dedup.jaccardArrays(col("a"), col("b")).as("j")).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("minhash LSH finds planted near-duplicates, not unrelated docs") {
    val pairs = Dedup.minhashDedupPairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)), s"exact dup pair missing: $pairs")
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L)),
      s"near dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"false positive: $pairs")
  }

  test("simhash of identical docs is identical; near-dups within small hamming") {
    val sh = Dedup.simhashFingerprints(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(3L))
    val hd = java.lang.Long.bitCount(sh(0L) ^ sh(1L))
    val hdOther = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(hd <= 8, s"near-dup hamming $hd")
    assert(hdOther > hd, s"unrelated doc closer ($hdOther) than near-dup ($hd)")
  }

  test("simhashDedupPairs finds the planted cluster") {
    val pairs = Dedup.simhashDedupPairs(docs, col("doc_id"), col("text"), maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)) && pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("ngramJaccardPairs finds near-dups within blocks") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
  }

  test("embeddingNearDupPairs finds duplicated vectors") {
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val rows = Seq((0L, v0.toSeq), (1L, v0.map(x => x * 1.001f).toSeq)) ++
      (2 until 30).map(i => (i.toLong, vec().toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.98, planes = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"missing planted near-dup: $pairs")
  }
}
