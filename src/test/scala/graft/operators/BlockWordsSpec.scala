package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the Aho–Corasick lexicon scanner: automaton construction
  * (shared prefixes, fail links, merged outputs), overlap counting,
  * boundary semantics via tokenization, and the DataFrame surface's
  * score/top-pattern election. */
class BlockWordsSpec extends SparkSpec {
  import spark.implicits._

  private def counts(lex: Seq[(String, Double)], text: String): Map[String, Int] = {
    val ac = BlockWords.build(lex)
    val c = ac.countMatches(
      text.toLowerCase.split("[^a-z0-9]+").iterator.filter(_.nonEmpty))
    ac.patterns.map(_.name).zip(c).toMap
  }

  test("unigrams count every occurrence with exact token boundaries") {
    val got = counts(Seq("spam" -> 1.0, "ham" -> 1.0),
      "spam, SPAM! hamster ham spammy (ham)")
    // 'hamster'/'spammy' are different tokens — no substring hits
    assert(got == Map("spam" -> 2, "ham" -> 2))
  }

  test("phrases match across tokens; overlapping repeats all count") {
    val got = counts(Seq("batch batch" -> 1.0),
      "batch batch batch x batch batch")
    assert(got("batch batch") == 3) // positions 1-2, 2-3, and after x
  }

  test("a unigram that prefixes a phrase is emitted via merged fail outputs") {
    val got = counts(Seq("a" -> 1.0, "a b c" -> 1.0, "b" -> 1.0),
      "a b c a b x a")
    // 'a' at 3 positions, 'b' at 2 (one INSIDE the phrase, one after),
    // the phrase once — the phrase walk must still emit its inner hits
    assert(got == Map("a" -> 3, "a b c" -> 1, "b" -> 2))
  }

  test("shared-prefix patterns both resolve; fail links cross subtrees") {
    val got = counts(
      Seq("x y" -> 1.0, "x z" -> 1.0, "y z" -> 1.0),
      "x y z x z")
    // 'x y z': after matching 'x y', the fail path must catch 'y z'
    assert(got == Map("x y" -> 1, "x z" -> 1, "y z" -> 1))
  }

  test("scan: hits/distinct/score/top election incl. lexicographic ties") {
    val df = Seq(
      (1L, "spark slow spark dup"),
      (2L, "batch batch batch"),
      (3L, "nothing here matches"),
      (4L, "slow spark")).toDF("doc_id", "text")
    val got = BlockWords.scan(df, col("doc_id"), col("text"),
        Seq("spark" -> 1.0, "slow" -> 2.0, "dup" -> 5.0,
            "batch" -> 1.0, "batch batch" -> 3.0))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    // doc 1: spark×2 + slow + dup = 4 hits, score 2+2+5 = 9, top spark
    assert(got(0) == ((1L, 4L, 3L, 9.0, "spark")))
    // doc 2: batch×3 + (batch batch)×2 = 5 hits, score 3+6 = 9, top batch
    assert(got(1) == ((2L, 5L, 2L, 9.0, "batch")))
    assert(got(2) == ((3L, 0L, 0L, 0.0, "")))
    // doc 4: spark×1, slow×1 — tie on count, lexicographic → slow
    assert(got(3) == ((4L, 2L, 2L, 3.0, "slow")))
  }

  test("build rejects empty lexicons and token-free patterns") {
    intercept[IllegalArgumentException] { BlockWords.build(Seq.empty) }
    intercept[IllegalArgumentException] { BlockWords.build(Seq("  " -> 1.0)) }
  }
}
