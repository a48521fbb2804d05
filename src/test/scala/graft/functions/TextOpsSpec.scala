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

  test("native hashedCharNGrams equals the HOF xxhash64-substr formulation") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val alphabet = "abcdefg 012"
    val rows = Seq("", "a", "ab", "abc", "aaaaaaa") ++
      Seq.fill(100)(Seq.fill(rnd.nextInt(80) + 1)(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = rows.toDF("t")
    for (n <- Seq(1, 3, 5)) {
      val hof = array_sort(array_distinct(
        when(length(col("t")) < n, array(xxhash64(col("t"))))
          .otherwise(transform(sequence(lit(0), length(col("t")) - n),
            i => xxhash64(substr(col("t"), i + 1, lit(n)))))))
      val got = df.select(
        TextOps.charNGramsHashedFromNormalized(col("t"), n).as("a"),
        hof.as("b"))
      assert(got.filter(not(col("a") === col("b"))).count() == 0, s"n=$n")
    }
  }

  test("native hashedWordShingles equals the sorted HOF formulation") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "x", "12")
    val rows = Seq("", "one", "one two") ++
      Seq.fill(80)(Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = rows.toDF("t").select(TextOps.tokens(col("t")).as("toks"))
    for (w <- Seq(2, 3, 5)) {
      val hof = array_sort(transform(
        TextOps.wordShinglesFromTokens(col("toks"), w), x => xxhash64(x)))
      val got = df.select(
        VectorExprs.hashedWordShingles(col("toks"), w).as("a"), hof.as("b"))
      assert(got.filter(not(col("a") === col("b"))).count() == 0, s"w=$w")
    }
  }

  test("qualityScore ranks clean prose above punct soup") {
    val clean = "the quick brown fox jumps over the lazy dog and it was good for all of them"
    val soup = "@@@ ### !!! 123 456 789 ,,, ... ;;;"
    val q1 = one[Double](TextOps.qualityScore(col("text")), clean)
    val q2 = one[Double](TextOps.qualityScore(col("text")), soup)
    assert(q1 > q2 + 0.3, s"clean=$q1 soup=$q2")
  }

  test("redactPii masks email/ipv4/phone and is idempotent") {
    val dirty = "mail a.b-c_9@sub.example.org, call +44 (020) 7946-0958, " +
      "or ssh to 192.168.001.42 after 5pm; short 12345 stays"
    val red = one[String](TextOps.redactPii(col("text")), dirty)
    assert(red == "mail <EMAIL>, call <PHONE>, or ssh to <IPV4> after 5pm; " +
      "short 12345 stays", red)
    // idempotent: a second pass changes nothing
    assert(one[String](TextOps.redactPii(TextOps.redactPii(col("text"))), dirty) == red)
    // counts align with what was masked, in the documented order
    val c = one[org.apache.spark.sql.Row](TextOps.piiCounts(col("text")), dirty)
    assert((c.getLong(0), c.getLong(1), c.getLong(2)) == ((1L, 1L, 1L)))
    // ipv4 runs before phone: a dotted quad is NOT swallowed as a phone
    val ipOnly = one[org.apache.spark.sql.Row](
      TextOps.piiCounts(col("text")), "host 10.1.2.3 up")
    assert((ipOnly.getLong(0), ipOnly.getLong(1), ipOnly.getLong(2)) == ((0L, 1L, 0L)))
  }
}
