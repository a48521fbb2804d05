package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // ref corpus: uni a:3 b:2 (T=5, V=2); bi (a,b):1 (b,a):2
  private def corpus = Seq(
    (0L, Seq("a", "b", "a"), true),
    (1L, Seq("b", "a"), true),
    (2L, Seq("z", "z"), false),  // fully OOV scored doc
    (3L, Seq("a"), false),       // single token: unigram term only
    (4L, Seq.empty[String], false), // empty: emits nothing
    (5L, Seq("a", "a", "b", "q"), false) // non-ref tokens must NOT train
  ).toDF("doc_id", "toks", "is_ref")

  private def ceOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    df.as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("bigramCrossEntropy matches hand-computed add-one LM terms") {
    val out = ceOf(LangModel.bigramCrossEntropy(
      corpus, col("doc_id"), col("toks"), col("is_ref")))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc0: -[ln(4/7) + ln(2/5) + ln(3/4)] / 3
    assert(out(0L) == (3L, r6(-(math.log(4.0 / 7) + math.log(2.0 / 5) +
      math.log(3.0 / 4)) / 3)))
    // doc2 (all OOV): -[ln(1/7) + ln(1/2)] / 2
    assert(out(2L) == (2L, r6((math.log(7.0) + math.log(2.0)) / 2)))
    // doc3: unigram only, -ln((3+1)/(5+2))
    assert(out(3L) == (1L, r6(-math.log(4.0 / 7))))
    // empty doc emits nothing
    assert(!out.contains(4L))
    // non-ref docs scored but not trained on: 'q' unseen => cu=0 path.
    // doc5 terms: uni(a) -ln(4/7); (a,a) cb=0 -ln(1/5); (a,b) cb=1
    // -ln(2/5); (b,q) cb=0, cu(b)=2 -ln(1/4)
    val d5 = out(5L)
    assert(d5._1 == 4L)
    assert(d5._2 == r6(-(math.log(4.0 / 7) + math.log(1.0 / 5) +
      math.log(2.0 / 5) + math.log(1.0 / 4)) / 4))
  }

  test("in-model text scores lower than out-of-model text") {
    val out = ceOf(LangModel.bigramCrossEntropy(
      corpus, col("doc_id"), col("toks"), col("is_ref")))
    assert(out(0L)._2 < out(2L)._2)
  }

  test("scores are invariant to input partitioning") {
    val a = ceOf(LangModel.bigramCrossEntropy(
      corpus.repartition(7), col("doc_id"), col("toks"), col("is_ref")))
    val b = ceOf(LangModel.bigramCrossEntropy(
      corpus.coalesce(1), col("doc_id"), col("toks"), col("is_ref")))
    assert(a == b)
  }
}
