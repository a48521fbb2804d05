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

  test("perplexityBuckets: per-language equal-mass thirds over (ce, doc_id), " +
      "keep drops exactly the tail") {
    // 7 "en" docs: 3 fluent (reference-like), 4 increasingly OOV; 2 "xx"
    // docs bucket WITHIN their own language, never against en scores
    val docs = Seq(
      (0L, Seq("a", "b", "a"), true, "en"),
      (1L, Seq("b", "a"), true, "en"),
      (2L, Seq("a", "b", "a", "b"), true, "en"),
      (3L, Seq("a", "q"), false, "en"),
      (4L, Seq("z", "z"), false, "en"),
      (5L, Seq("z", "q", "y"), false, "en"),
      (6L, Seq("a"), false, "en"),
      (7L, Seq("z"), false, "xx"),
      (8L, Seq("a", "b"), false, "xx")
    ).toDF("doc_id", "toks", "is_ref", "lang")
    val out = LangModel.perplexityBuckets(docs, col("doc_id"), col("toks"),
        col("is_ref"), col("lang"))
      .as[(Long, String, Long, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // ntile(3) over 7 en docs: bucket sizes 3, 2, 2 in (ce, doc_id) order
    val enByBucket = out.values.filter(_._2 == "en").groupBy(_._5)
      .map { case (b, rs) => b -> rs.map(_._1).toSet }
    assert(enByBucket(1L).size == 3 && enByBucket(2L).size == 2 &&
      enByBucket(3L).size == 2, enByBucket.toString)
    // the fluent reference docs rank ahead of the OOV docs
    assert(enByBucket(1L).subsetOf(Set(0L, 1L, 2L, 6L)), enByBucket(1L).toString)
    assert(enByBucket(3L).subsetOf(Set(3L, 4L, 5L)), enByBucket(3L).toString)
    // keep = not-tail, and the xx docs bucket within their own partition
    out.values.foreach(r => assert(r._6 == (if (r._5 < 3L) 1L else 0L)))
    val xx = out.values.filter(_._2 == "xx").map(r => r._1 -> r._5).toMap
    assert(xx(8L) == 1L && xx(7L) > 1L, s"xx buckets: $xx") // in-model text heads
  }

  test("perplexityBuckets ties break on doc_id (deterministic under " +
      "repartitioning)") {
    // four identical docs => identical ce: buckets must follow doc_id
    val docs = (0L until 4L).map(i => (i, Seq("a", "b"), i == 0L, "en"))
      .toDF("doc_id", "toks", "is_ref", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      LangModel.perplexityBuckets(df, col("doc_id"), col("toks"),
          col("is_ref"), col("lang"))
        .as[(Long, String, Long, Double, Long, Long)].collect()
        .map(r => r._1 -> r._5).toMap
    val a = run(docs.repartition(5))
    assert(a == Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 3L), a.toString)
    assert(a == run(docs.coalesce(1)))
  }

  // ---------------- Kneser-Ney trigram -------------------------------
  // ref: doc10 "a b c a b d", doc11 "a b c"
  //   tri: (a,b,c):2 (b,c,a):1 (c,a,b):1 (a,b,d):1
  //   ctx2(a,b): den3=3 uniq3=2;  mid all n3bc=1;  ctx1(b): den2=2 uniq2=2
  //   bi: (a,b):3 (b,c):2 (c,a):1 (b,d):1 -> B=4; V=4
  //   D3 = 3/(3+2*1) = 0.6;  D2 = 4/(4+0) = 1.0
  private def knCorpus = Seq(
    (10L, Seq("a", "b", "c", "a", "b", "d"), true),
    (11L, Seq("a", "b", "c"), true),
    (12L, Seq("a", "b", "c"), false),  // seen trigram, scored only
    (13L, Seq("z", "z", "z"), false),  // fully OOV -> unigram floor
    (14L, Seq("a", "b"), false)        // < 3 tokens: emits nothing
  ).toDF("doc_id", "toks", "is_ref")

  test("knTrigramCrossEntropy matches hand-computed interpolated KN terms") {
    val out = ceOf(LangModel.knTrigramCrossEntropy(
      knCorpus, col("doc_id"), col("toks"), col("is_ref")))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // (a,b,c): p1(c) = (1+1)/(4+4+1) = 2/9
    //          p2(c|b) = max(1-1,0)/2 + 1*2/2 * 2/9 = 2/9
    //          p3 = max(2-0.6,0)/3 + 0.6*2/3 * 2/9
    val p3 = 1.4 / 3 + 0.6 * 2 / 3 * (2.0 / 9)
    assert(out(12L) == (1L, r6(-math.log(p3))), out(12L).toString)
    // OOV (z,z,z): unseen contexts all the way down -> p = (0+1)/9
    assert(out(13L) == (1L, r6(math.log(9.0))), out(13L).toString)
    assert(!out.contains(14L))
    // ref doc11 scores its own trigram identically
    assert(out(11L) == out(12L))
  }

  test("KN separates in-model text from gibberish") {
    val kn = ceOf(LangModel.knTrigramCrossEntropy(
      knCorpus, col("doc_id"), col("toks"), col("is_ref")))
    assert(kn(12L)._2 < kn(13L)._2)
  }

  test("knTrigram is partitioning-invariant") {
    val a = ceOf(LangModel.knTrigramCrossEntropy(
      knCorpus.repartition(5), col("doc_id"), col("toks"), col("is_ref")))
    val b = ceOf(LangModel.knTrigramCrossEntropy(
      knCorpus.coalesce(1), col("doc_id"), col("toks"), col("is_ref")))
    assert(a == b)
  }
}
