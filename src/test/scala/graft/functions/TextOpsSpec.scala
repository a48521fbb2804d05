package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect()(0).getAs[T]("r")

  test("tokens and tokenCount") {
    assert(one[Long](TextOps.tokenCount(col("text")), "the quick  brown fox") == 4L)
    assert(one[Long](TextOps.tokenCount(col("text")), "   ") == 0L)
    assert(one[Long](TextOps.tokenCount(col("text")), "") == 0L)
  }

  test("bpeish token count splits letters, digits, punct") {
    // "ab12, c" -> [ab][1][2][,][c] = 5
    assert(one[Long](TextOps.bpeishTokenCount(col("text")), "ab12, c") == 5L)
  }

  test("charNGrams produce distinct n-grams") {
    val got = one[collection.Seq[String]](TextOps.charNGrams(col("text"), 2), "abab")
    assert(got.toSet == Set("ab", "ba"))
  }

  test("wordShingles") {
    val got = one[collection.Seq[String]](TextOps.wordShingles(col("text"), 2), "a b c")
    assert(got.toSet == Set("a b", "b c"))
  }

  test("ratios") {
    assert(math.abs(one[Double](TextOps.punctRatio(col("text")), "ab,.") - 0.5) < 1e-12)
    assert(math.abs(one[Double](TextOps.digitRatio(col("text")), "a1b2") - 0.5) < 1e-12)
    assert(math.abs(one[Double](TextOps.upperRatio(col("text")), "aBcD") - 0.5) < 1e-12)
    assert(math.abs(one[Double](TextOps.stopwordRatio(col("text")), "the cat sat") - 1.0 / 3) < 1e-12)
    assert(math.abs(one[Double](TextOps.meanTokenLength(col("text")), "ab cdef") - 3.0) < 1e-12)
  }

  test("langId picks the language with most marker hits") {
    assert(one[String](TextOps.langId(col("text")), "the cat and the dog was here") == "en")
    assert(one[String](TextOps.langId(col("text")), "der hund und die katze ist nicht da") == "de")
    assert(one[String](TextOps.langId(col("text")), "le chat est dans la maison pour une nuit") == "fr")
    assert(one[String](TextOps.langId(col("text")), "xyzzy qwerty") == "und")
  }

  test("langId classifies CJK scripts by codepoint class") {
    assert(one[String](TextOps.langId(col("text")), "今天天气很好我们去公园散步吧这是一个测试") == "zh")
    assert(one[String](TextOps.langId(col("text")), "今日はいい天気ですね公園へ行きましょう") == "ja")
    assert(one[String](TextOps.langId(col("text")), "오늘 날씨가 좋아서 공원에 갑니다") == "ko")
    // Latin text with a couple of CJK chars stays on the marker path
    assert(one[String](TextOps.langId(col("text")), "the cat and the dog was here 好") == "en")
  }

  test("fingerprints are deterministic and normalization-invariant") {
    val a = one[String](TextOps.fingerprintMd5(col("text")), "Hello, World!")
    val b = one[String](TextOps.fingerprintMd5(col("text")), "hello world")
    assert(a == b) // normalization strips punct + case
    val h1 = one[Long](TextOps.rollingHash(col("text")), "hello world")
    val h2 = one[Long](TextOps.rollingHash(col("text")), "hello world")
    val h3 = one[Long](TextOps.rollingHash(col("text")), "world hello")
    assert(h1 == h2 && h1 != h3) // order-sensitive
  }

  test("qualityScore ranks clean prose above punct soup") {
    val clean = "the quick brown fox jumps over the lazy dog and it was good for all of them"
    val soup = "@@@ ### !!! 123 456 789 ,,, ... ;;;"
    val q1 = one[Double](TextOps.qualityScore(col("text")), clean)
    val q2 = one[Double](TextOps.qualityScore(col("text")), soup)
    assert(q1 > q2 + 0.3, s"clean=$q1 soup=$q2")
  }
}
