package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the max-likelihood segmentation") {
    val v = Map("a" -> -1.0, "b" -> -1.2, "ab" -> -1.9)
    assert(Unigram.viterbi("ab", v, 2) == List("ab"))
    assert(Unigram.viterbi("aab", v, 2) == List("a", "ab"))
    assert(Unigram.viterbi("b", v, 2) == List("b"))
  }

  test("viterbi tie-breaks: fewer pieces, then longer last piece") {
    // equal score, different piece count -> fewer wins
    assert(Unigram.viterbi("aa", Map("a" -> -1.0, "aa" -> -2.0), 2)
      == List("aa"))
    // equal score AND count -> longer last piece wins
    val v = Map("a" -> -1.0, "c" -> -1.0, "ab" -> -2.0, "bc" -> -2.0)
    assert(Unigram.viterbi("abc", v, 2) == List("a", "bc"))
  }

  test("train: closed-form seed, hard-EM recount, char floor, fenced logps") {
    val docs = Seq((0L, "ab ab cd"), (1L, "ab cd cd")).toDF("doc_id", "text")
    val vocab = Unigram.train(docs, col("text"), vocabSize = 6,
      maxPieceLen = 2, minCount = 1, seedCap = 10, rounds = 1)
    val m = vocab.map(p => p.piece -> p).toMap
    assert(vocab.map(_.piece) == Seq("a", "ab", "b", "c", "cd", "d"))
    // round 1: every word segments to its 2-char piece; chars floor to 1
    assert(m("ab").cnt == 3 && m("cd").cnt == 3)
    assert(Seq("a", "b", "c", "d").forall(m(_).cnt == 1))
    // total = 10; fence6(ln(3/10)) and fence6(ln(1/10))
    assert(m("ab").logp == Unigram.fence6(math.log(3.0 / 10)))
    assert(m("a").logp == Unigram.fence6(math.log(1.0 / 10)))
  }

  test("encodeStats digests match a hand computation") {
    val docs = Seq((0L, "ab ab cd"), (1L, "ab cd cd")).toDF("doc_id", "text")
    val vocab = Unigram.train(docs, col("text"), vocabSize = 6,
      maxPieceLen = 2, minCount = 1, seedCap = 10, rounds = 1)
    val out = Unigram.encodeStats(docs, col("doc_id"), col("text"), vocab,
        maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    // ids sorted by piece: a=0, ab=1, b=2, c=3, cd=4, d=5
    assert(out(("piece", 1L))._1 == "ab" && out(("piece", 1L))._2 == 3L)
    // doc 0 = [ab, ab, cd] at pos 1,2,3: n=3, idsum=1+1+4, possum=1+2+12
    assert(out(("doc", 0L)) == (("", 3L, 6L, 15L, 0.0)))
    // doc 1 = [ab, cd, cd]: idsum=1+4+4=9, possum=1+8+12=21
    assert(out(("doc", 1L)) == (("", 3L, 9L, 21L, 0.0)))
  }

  test("encodeStats byte-falls-back for words with no lattice path") {
    val docs = Seq((0L, "ab ab cd"), (1L, "ab cd cd")).toDF("doc_id", "text")
    val vocab = Unigram.train(docs, col("text"), vocabSize = 6,
      maxPieceLen = 2, minCount = 1, seedCap = 10, rounds = 1)
    // ids: a=0, ab=1, b=2, c=3, cd=4, d=5; byte base = 6
    val oov = Seq((0L, "ab x9 cd")).toDF("doc_id", "text")
    val out = Unigram.encodeStats(oov, col("doc_id"), col("text"), vocab,
        maxPieceLen = 2)
      .filter(col("kind") === "doc").collect()(0)
    // "x9" has no lattice path → UTF-8 bytes: x=0x78→6+120=126, 9=0x39→6+57=63
    // tokens: ab(1) 126 63 cd(4): n=4, idsum=1+126+63+4=194,
    // possum=1·1+2·126+3·63+4·4=458
    assert((out.getLong(3), out.getLong(4), out.getLong(5)) == ((4L, 194L, 458L)))
    // viterbi (the training path) still fails LOUDLY — closure is a
    // training invariant, only the encode path byte-falls-back
    val e = intercept[IllegalArgumentException] {
      Unigram.viterbi("x9", vocab.map(p => p.piece -> p.logp).toMap, 2)
    }
    assert(e.getMessage.contains("not segmentable"))
  }

  test("training is deterministic under repartitioning and words stay coverable") {
    val docs = Seq((0L, "the quick brown fox"), (1L, "the lazy dog dog"),
      (2L, "quick quick brown")).toDF("doc_id", "text")
    val v1 = Unigram.train(docs, col("text"), vocabSize = 26,
      maxPieceLen = 3, minCount = 1, seedCap = 8, rounds = 2)
    val v2 = Unigram.train(docs.repartition(7), col("text"), vocabSize = 26,
      maxPieceLen = 3, minCount = 1, seedCap = 8, rounds = 2)
    assert(v1 == v2)
    val vm = v1.map(p => p.piece -> p.logp).toMap
    Seq("the", "quick", "brown", "fox", "lazy", "dog").foreach { w =>
      assert(Unigram.viterbi(w, vm, 3).mkString("") == w)
    }
  }

  test("property: viterbi equals brute-force enumeration under the tie order") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    def allSegs(w: String, vocab: Map[String, Double], L: Int): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(L, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (vocab.contains(p)) allSegs(w.substring(l), vocab, L).map(p :: _)
        else Nil
      }
    for (_ <- 1 to 300) {
      val L = 1 + rnd.nextInt(3) // max piece length 1..3
      val word = Seq.fill(1 + rnd.nextInt(7))(alphabet(rnd.nextInt(3))).mkString
      // random multi-char pieces over the alphabet + full char closure;
      // logps drawn from a tiny grid so score TIES actually occur
      val pieces = (alphabet.map(_.toString) ++
        Seq.fill(6)(Seq.fill(2 + rnd.nextInt(2))(alphabet(rnd.nextInt(3))).mkString))
        .distinct.filter(_.length <= L)
      val vocab = pieces.map(p => p -> -(1 + rnd.nextInt(3)).toDouble).toMap
      val got = Unigram.viterbi(word, vocab, L)
      // best under (score desc, count asc, last-piece-len desc, then any):
      val scored = allSegs(word, vocab, L)
        .map(s => (s, s.map(vocab).sum, s.length, s.last.length))
      val bestScore = scored.map(_._2).max
      val atScore = scored.filter(_._2 == bestScore)
      val bestK = atScore.map(_._3).min
      val atK = atScore.filter(_._3 == bestK)
      val bestL = atK.map(_._4).max
      val gotScore = got.map(vocab).sum
      assert(gotScore == bestScore && got.length == bestK &&
        got.last.length == bestL,
        s"word=$word vocab=$vocab got=$got expected score=$bestScore k=$bestK lastLen=$bestL")
    }
  }

  test("sampleSegment: valid, deterministic, alpha-extremes behave") {
    val v = Map("a" -> -1.0, "b" -> -1.5, "ab" -> -1.2, "ba" -> -2.5,
      "aba" -> -2.0)
    val words = Seq("ab", "aba", "abab", "bab", "aabba")
    // validity + per-salt determinism
    for (w <- words; salt <- Seq("s1", "s2", "s3")) {
      val s = Unigram.sampleSegment(w, v, 3, alpha = 1.0, salt = salt)
      assert(s.mkString("") == w && s.forall(v.contains))
      assert(s == Unigram.sampleSegment(w, v, 3, alpha = 1.0, salt = salt))
    }
    // different salts eventually yield different segmentations
    val variants = (1 to 50).map(i =>
      Unigram.sampleSegment("abab", v, 3, alpha = 1.0, salt = s"x$i")).toSet
    assert(variants.size > 1, "alpha=1 sampling should explore")
    // alpha -> infinity concentrates on the Viterbi argmax (score equality)
    val vit = Unigram.viterbi("abab", v, 3).map(v).sum
    (1 to 20).foreach { i =>
      val s = Unigram.sampleSegment("abab", v, 3, alpha = 1000.0, salt = s"y$i")
      assert(s.map(v).sum == vit, s"high-alpha sample missed the argmax: $s")
    }
    // alpha = 0 is uniform over the FOUR segmentations of "aba":
    // [aba], [ab,a], [a,ba], [a,b,a] — each should actually occur
    val segs = (1 to 200).map(i =>
      Unigram.sampleSegment("aba", v, 3, alpha = 0.0, salt = s"z$i"))
    val counts = segs.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.size == 4, s"expected all 4 segmentations, got ${counts.keys}")
    assert(counts.values.forall(_ > 20), s"grossly non-uniform at alpha=0: $counts")
  }

  test("vocabulary round-trips through the persisted artifact") {
    val docs = Seq((0L, "ab ab cd"), (1L, "ab cd cd")).toDF("doc_id", "text")
    val vocab = Unigram.train(docs, col("text"), vocabSize = 6,
      maxPieceLen = 2, minCount = 1, seedCap = 10, rounds = 1)
    val dir = java.nio.file.Files.createTempDirectory("unigram_vocab_").toString
    Unigram.writeVocab(spark, dir, vocab)
    assert(Unigram.readVocab(spark, dir) == vocab)
  }

  test("trains and encodes the real fixture corpus end-to-end") {
    val docs = graft.Tables.documents(spark, sf001)
    val vocab = Unigram.train(docs, col("text"), vocabSize = 48,
      maxPieceLen = 4, minCount = 2, seedCap = 48, rounds = 2)
    assert(vocab.size <= 48 && vocab.exists(_.piece.length > 1))
    val out = Unigram.encodeStats(docs, col("doc_id"), col("text"), vocab)
    val docsN = out.filter(col("kind") === "doc").count()
    assert(docsN == docs.count())
  }
}
