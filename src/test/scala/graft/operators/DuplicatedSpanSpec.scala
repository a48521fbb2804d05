package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DuplicatedSpanSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(rows: Seq[(Long, Seq[String])], n: Int) =
    Dedup.duplicatedSpanStats(rows.toDF("doc_id", "toks"),
        col("doc_id"), col("toks"), n)
      .as[(Long, Long, Long, Long, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("cross-doc and within-doc duplicated spans, coverage union") {
    val out = statsOf(Seq(
      0L -> Seq("a", "b", "c", "d"),
      1L -> Seq("x", "a", "b", "c"),
      2L -> Seq("p", "q", "r", "p", "q", "r"),
      3L -> Seq("z", "z"),
      4L -> Seq.empty[String]), n = 3)
    // doc0: spans abc,bcd — abc also in doc1 => 1 dup covering tokens 1-3
    assert(out(0L) == ((0L, 4L, 2L, 1L, 0.5, 3L, 0.75)))
    // doc1: dup span starts at 2, covers tokens 2-4
    assert(out(1L) == ((1L, 4L, 2L, 1L, 0.5, 3L, 0.75)))
    // doc2: pqr repeats WITHIN the doc (starts 1 and 4) => full coverage
    assert(out(2L) == ((2L, 6L, 4L, 2L, 0.5, 6L, 1.0)))
    // too-short and empty docs: zero spans, zero fractions, still present
    assert(out(3L) == ((3L, 2L, 0L, 0L, 0.0, 0L, 0.0)))
    assert(out(4L) == ((4L, 0L, 0L, 0L, 0.0, 0L, 0.0)))
  }

  test("overlapping duplicated spans union their token intervals") {
    // spans: mno(1) nom(2) omn(3) mno(4) nom(5); mno,nom dup =>
    // starts {1,2,4,5} cover [1,3]∪[2,4]∪[4,6]∪[5,7] = all 7 tokens
    val out = statsOf(Seq(
      0L -> Seq("m", "n", "o", "m", "n", "o", "m")), n = 3)
    assert(out(0L) == ((0L, 7L, 5L, 4L, 0.8, 7L, 1.0)))
  }

  test("stats are invariant to input partitioning") {
    val rows = (0L until 40L).map(i =>
      i -> (0 until 30).map(t => s"w${(i + t) % 17}"))
    val a = Dedup.duplicatedSpanStats(rows.toDF("doc_id", "toks").repartition(7),
      col("doc_id"), col("toks"), 5).collect().toSet
    val b = Dedup.duplicatedSpanStats(rows.toDF("doc_id", "toks").coalesce(1),
      col("doc_id"), col("toks"), 5).collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
