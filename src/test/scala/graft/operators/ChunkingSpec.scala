package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(lens: Seq[Int]) =
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(t => s"t$t"))
    }.toDF("doc_id", "toks")

  test("slidingChunks: coverage, overlap, and boundary arithmetic") {
    val df = docsOf(Seq(0, 1, 10, 16, 17, 32, 33, 100))
    val chunks = Chunking.slidingChunks(df, col("doc_id"), col("toks"),
      maxLen = 16, stride = 8)
      .as[(Long, Long, Seq[String])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // empty doc emits nothing; short docs emit exactly one chunk
    assert(!chunks.contains(0L))
    assert(chunks(1L).map(_._3).toSeq == Seq(Seq("t0")))
    assert(chunks(2L).map(_._3.size).toSeq == Seq(10))
    assert(chunks(3L).map(_._3.size).toSeq == Seq(16))
    // one past maxLen: second chunk starts at stride and reaches the end
    assert(chunks(4L).map(_._3.size).toSeq == Seq(16, 9))
    assert(chunks(4L)(1)._3.head == "t8")
    // nChunks = 1 + ceil((n-16)/8): n=32 -> 3, n=33 -> 4, n=100 -> 12
    assert(chunks(5L).size == 3 && chunks(6L).size == 4 && chunks(7L).size == 12)
    // every chunk except the last is exactly maxLen; ids dense from 0
    for ((_, cs) <- chunks) {
      assert(cs.map(_._2).toSeq == cs.indices.map(_.toLong).toSeq)
      cs.init.foreach(c => assert(c._3.size == 16))
      assert(cs.last._3.nonEmpty)
    }
    // full coverage with the right overlap: chunk i starts at i*stride
    for ((_, cs) <- chunks; (c, i) <- cs.zipWithIndex)
      assert(c._3.head == s"t${i * 8}")
  }

  test("slidingChunks: stride == maxLen gives a disjoint partition of tokens") {
    val df = docsOf(Seq(25))
    val chunks = Chunking.slidingChunks(df, col("doc_id"), col("toks"),
      maxLen = 10, stride = 10)
      .as[(Long, Long, Seq[String])].collect().sortBy(_._2)
    assert(chunks.flatMap(_._3).toSeq == (0 until 25).map(t => s"t$t"))
  }

  test("slidingChunks rejects degenerate parameters") {
    val df = docsOf(Seq(5))
    intercept[IllegalArgumentException](
      Chunking.slidingChunks(df, col("doc_id"), col("toks"), 0, 1))
    intercept[IllegalArgumentException](
      Chunking.slidingChunks(df, col("doc_id"), col("toks"), 8, 9))
  }
}
