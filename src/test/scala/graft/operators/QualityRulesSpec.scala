package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  test("gopherFlags evaluates each rule against hand-computed docs") {
    val goodBody = "the of " + Seq.tabulate(48)(i => s"word$i").mkString(" ")
    val docs = Seq(
      // 50 words, mean len in range, 2 stopword hits (the, of), no punct
      (0L, goodBody),
      // too short
      (1L, "the of tiny doc"),
      // no stopwords
      (2L, Seq.tabulate(60)(i => s"token$i").mkString(" ")),
      // punctuation-heavy
      (3L, ("the of " + Seq.fill(48)("w!!!").mkString(" ")).trim),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = QualityRules.gopherFlags(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select("doc_id", "w_ok", "mwl_ok", "stop_ok", "punct_ok", "pass")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got(0) == ((0L, 1L, 1L, 1L, 1L, 1L)), s"good doc: ${got(0)}")
    assert(got(1)._2 == 0L && got(1)._6 == 0L, s"short doc: ${got(1)}")
    assert(got(2)._4 == 0L && got(2)._6 == 0L, s"no-stopword doc: ${got(2)}")
    assert(got(3)._5 == 0L && got(3)._6 == 0L, s"punct doc: ${got(3)}")
    assert(got(4) == ((4L, 0L, 0L, 0L, 1L, 0L)), s"empty doc: ${got(4)}")
  }

  test("repetitionStats matches hand-computed ratios") {
    // doc 0: "a b a b a" -> top word a: 3/5; 2-grams: ab,ba,ab,ba -> 2/4
    // distinct -> dup 0.5; 3-grams: aba,bab,aba -> 2/3 distinct -> dup 1/3
    // doc 1: all distinct -> top 1/4, no dup grams
    // doc 2: two words -> d3 = 0 (fewer than 3 words)
    val docs = Seq(
      (0L, "a b a b a"),
      (1L, "w x y z"),
      (2L, "p q"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = QualityRules.repetitionStats(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L), "empty doc must be dropped")
    assert(got(0) == ((0L, 0.6, 0.5, math.rint((1.0 - 2.0 / 3.0) * 1e6) / 1e6)), s"${got(0)}")
    assert(got(1) == ((1L, 0.25, 0.0, 0.0)), s"${got(1)}")
    assert(got(2) == ((2L, 0.5, 0.0, 0.0)), s"${got(2)}")
  }

  test("entropyStats: closed-form entropy, normalization, and edge docs") {
    val docs = Seq(
      (0L, "a a b b"),      // uniform over 2 types: H = ln 2, norm = 1
      (1L, "x x x x"),      // single type: H = 0, norm = 0
      (2L, ""),             // empty: all zeros
      (3L, "p q r s")       // all distinct: H = ln 4, norm = 1, ttr = 1
    ).toDF("doc_id", "text")
    val got = QualityRules.entropyStats(docs, col("doc_id"),
        graft.functions.TextOps.tokens(col("text")))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(0) == ((0L, 4L, 2L, r6(math.log(2)), 1.0, 0.5)), s"${got(0)}")
    assert(got(1) == ((1L, 4L, 1L, 0.0, 0.0, 0.25)), s"${got(1)}")
    assert(got(2) == ((2L, 0L, 0L, 0.0, 0.0, 0.0)), s"${got(2)}")
    assert(got(3) == ((3L, 4L, 4L, r6(math.log(4)), 1.0, 1.0)), s"${got(3)}")
  }

  test("c4LineFilter: terminal punctuation, min words, banned substrings, reassembly") {
    import spark.implicits._
    val doc = Seq(
      (1L, "This line is properly terminated.\nno punctuation here\ntoo short.\n" +
        "Contains JavaScript libraries today.\nAnother good line stays!\n" +
        "  trailing spaces fine.   "),
      (2L, ""),
      (3L, "one two three?")
    ).toDF("doc_id", "text")
    val out = QualityRules.c4LineFilter(doc, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    // doc1: 6 lines; kept = line1 (terminated, 5 words), line5, line6
    //  - "no punctuation here": no terminal punct -> drop
    //  - "too short.": 2 words -> drop
    //  - JavaScript line: banned (case-insensitive) -> drop
    assert(out(0)._2 == 6L && out(0)._3 == 3L, out(0).toString)
    assert(out(0)._4 == "This line is properly terminated.\nAnother good line stays!\n  trailing spaces fine.   ")
    // empty text: one empty line, nothing kept
    assert(out(1) == ((2L, 1L, 0L, "")))
    // exactly minWords with '?' terminal keeps
    assert(out(2) == ((3L, 1L, 1L, "one two three?")))
  }
}
