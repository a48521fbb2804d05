package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("wrap splices the ## continuation class after every boundary") {
    val got = Seq("abc", "a").toDF("word")
      .select(WordPiece.wpWrap(col("word")).as("w"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("|a||##b||##c|", "|a|"))
    val back = Seq("|a||##b||##c|").toDF("w")
      .select(WordPiece.wpUnwrap(col("w")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(back == Seq("a", "##b", "##c"))
  }

  test("training picks the SCORE argmax, not the count argmax") {
    // "ab" x5, "cd" x4, "ad" x1 → counts: a=6, ##b=5, c=4, ##d=5;
    // pairs: (a,##b)=5 score 5/30, (c,##d)=4 score 4/20, (a,##d)=1.
    // BPE would merge (a,##b) (highest count); WordPiece must take (c,##d).
    val d = docs(Seq(
      "ab ab ab ab ab", "cd cd cd cd", "ad"))
    val m = WordPiece.train(d, col("text"), nMerges = 1)
    assert(m.size == 1)
    assert(m.head == WordPiece.WpMerge("c", "##d", 4L, 4L, 5L), m.head.toString)
    assert(m.head.merged == "cd")
  }

  test("merged symbols keep the left class and compose over iterations") {
    // single word "aaab" x2: merges chain through ##-classed symbols
    val d = docs(Seq("aaab aaab"))
    val m = WordPiece.train(d, col("text"), nMerges = 3)
    assert(m.nonEmpty && m.forall(x => x.right.startsWith("##")))
    // after enough merges the word collapses to one symbol and training
    // stops early (no adjacent pair left)
    val inv = WordPiece.pieces(d, col("text"), m)
    assert(WordPiece.maxMatch("aaab", inv.toSet).isDefined)
    val exhausted = WordPiece.train(d, col("text"), nMerges = 10)
    assert(exhausted.size == 3, s"expected exhaustion at 3, got ${exhausted.size}")
  }

  test("maxMatch is greedy longest-first with positional classes") {
    val inv = Set("a", "##b", "##c", "ab")
    assert(WordPiece.maxMatch("ab", inv) == Some(List("ab")),
      "longest match wins over a + ##b")
    assert(WordPiece.maxMatch("abc", inv) == Some(List("ab", "##c")))
    assert(WordPiece.maxMatch("aab", inv).isEmpty, "mid-word 'a' has no ## class")
    assert(WordPiece.maxMatch("ba", inv).isEmpty, "'b' bare is not in inventory")
  }

  test("corpus words never UNK against their own trained inventory") {
    val rnd = new scala.util.Random(7)
    val words = Vector.fill(60)(
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val d = docs(words.grouped(6).map(_.mkString(" ")).toSeq)
    val m = WordPiece.train(d, col("text"), nMerges = 12)
    val inv = WordPiece.pieces(d, col("text"), m).toSet
    words.foreach { w =>
      assert(WordPiece.maxMatch(w, inv).isDefined, s"'$w' lost closure") }
    // and every segmentation reassembles its word exactly
    words.foreach { w =>
      val seg = WordPiece.maxMatch(w, inv).get
      assert(seg.head.charAt(0) != '#', "first piece is bare-classed")
      assert(seg.tail.forall(_.startsWith("##")))
      assert(seg.map(_.stripPrefix("##")).mkString == w)
    }
  }

  test("encodeStats: digests match a hand computation") {
    val d = docs(Seq("ab ab", "ab zq"))
    val m = WordPiece.train(d, col("text"), nMerges = 1)
    // counts: a=3... words: ab(freq 3), zq(1): symbols a=3,##b=3,z=1,##q=1
    // pairs: (a,##b)=3 score 3/9; (z,##q)=1 score 1/1 → merge (z,##q)!
    assert(m.head.merged == "zq")
    val inv = WordPiece.pieces(d, col("text"), m)
    // alphabet {a,##b,z,##q} + zq → sorted: ##b, ##q, a, z, zq
    assert(inv == Seq("##b", "##q", "a", "z", "zq"))
    val out = WordPiece.encodeStats(d, col("doc_id"), col("text"), m, inv)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val mergeRows = out.filter(_._1 == "merge")
    assert(mergeRows.toSeq == Seq(("merge", 1L, "z", "##q", 1L, 1L, 1L)))
    val docRows = out.filter(_._1 == "doc").map(r => r._2 -> ((r._5, r._6, r._7))).toMap
    // ids: ##b=0, ##q=1, a=2, z=3, zq=4; doc0 = "ab ab" → a ##b a ##b:
    // n=4, sum=2+0+2+0=4, possum=1·2+2·0+3·2+4·0=8
    assert(docRows(0L) == ((4L, 4L, 8L)))
    // doc1 = "ab zq" → a ##b zq: n=3, sum=2+0+4=6, possum=1·2+2·0+3·4=14
    assert(docRows(1L) == ((3L, 6L, 14L)))
  }

  test("encodeStats against a PRUNED inventory byte-falls-back, no [UNK]") {
    val d = docs(Seq("ab ab", "ab zq"))
    val m = WordPiece.train(d, col("text"), nMerges = 1)
    val inv = WordPiece.pieces(d, col("text"), m)
    // drop every 'z'-bearing piece: "zq" becomes unmatchable mid-walk
    val pruned = inv.filterNot(p => p.contains("z"))
    assert(pruned == Seq("##b", "##q", "a"))
    val out = WordPiece.encodeStats(d, col("doc_id"), col("text"), m, pruned)
      .filter(col("kind") === "doc")
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // ids over pruned: ##b=0, ##q=1, a=2; byte base = 3 (= |pieces|)
    // doc0 "ab ab" → a ##b a ##b: n=4, sum=4, possum=8 (unchanged)
    assert(out(0L) == ((4L, 4L, 8L)))
    // doc1 "ab zq" → a ##b then the dead word's UTF-8 BYTES:
    // 'z'=0x7a→3+122=125, 'q'=0x71→3+113=116; n=4, sum=2+0+125+116=243,
    // possum=1·2+2·0+3·125+4·116=841
    assert(out(1L) == ((4L, 243L, 841L)))
  }

  test("byte fallback: arbitrary post-normalization input never drops " +
      "a word, never emits [UNK], and byte ids decode back") {
    val d = docs(Seq("ab ab", "ab zq"))
    val m = WordPiece.train(d, col("text"), nMerges = 1)
    val inv = WordPiece.pieces(d, col("text"), m)
    val base = inv.size
    // random words over the FULL pre-tokenizer alphabet [a-z0-9] — far
    // outside the {a,b,z,q} training inventory (raw CJK/emoji are
    // stripped by TextOps.normalized before tokenization, the pipeline's
    // pre-tokenization contract; fallback covers everything after it)
    val rnd = new scala.util.Random(23)
    val alphabet = "abzq0123456789xkw"
    val weird = (0 until 40).map(_ =>
      (0 to rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val fd = docs(weird.grouped(5).map(_.mkString(" ")).toSeq)
    val rows = WordPiece.encodeStats(fd, col("doc_id"), col("text"), m, inv)
      .filter(col("kind") === "doc")
      .collect().map(r => (r.getLong(1), r.getLong(4)))
    // every doc emits at least its word count in tokens (nothing dropped)
    val wordsPerDoc = weird.grouped(5).map(_.count(_.nonEmpty)).toSeq
    rows.foreach { case (docId, n) =>
      assert(n >= wordsPerDoc(docId.toInt), s"doc $docId lost words") }
    // and a known OOV word round-trips through its byte ids exactly
    val seg = WordPiece.encodeStats(docs(Seq("x9")), col("doc_id"), col("text"), m, inv)
      .filter(col("kind") === "doc").collect()
    val bytes = "x9".getBytes("UTF-8").map(b => (b & 0xff).toLong + base)
    assert(seg(0).getLong(4) == bytes.length.toLong)
    assert(seg(0).getLong(5) == bytes.sum)
    assert(seg(0).getLong(6) ==
      bytes.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum)
  }

  test("train on an empty corpus fails with a clear message, not an NPE") {
    val e = intercept[IllegalArgumentException] {
      WordPiece.train(docs(Seq("", "   ")), col("text"), nMerges = 1)
    }
    assert(e.getMessage.contains("no tokens"), e.getMessage)
  }

  test("training and encoding are invariant under repartitioning") {
    val texts = Seq("the cat sat", "the bat sat on the mat", "cat and bat",
      "satin hat", "thin mat on cat")
    val d1 = docs(texts)
    val d2 = docs(texts).repartition(7)
    val m1 = WordPiece.train(d1, col("text"), nMerges = 8)
    val m2 = WordPiece.train(d2, col("text"), nMerges = 8)
    assert(m1 == m2)
    val inv = WordPiece.pieces(d1, col("text"), m1)
    val s1 = WordPiece.encodeStats(d1, col("doc_id"), col("text"), m1, inv)
      .collect().toSeq
    val s2 = WordPiece.encodeStats(d2, col("doc_id"), col("text"), m2, inv)
      .collect().toSeq
    assert(s1 == s2)
  }

  test("write/read round-trips the merge table in training order") {
    val d = docs(Seq("abc abc ab", "bc abc"))
    val m = WordPiece.train(d, col("text"), nMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_wp_").toString
    WordPiece.writeWp(spark, dir, m)
    assert(WordPiece.readWp(spark, dir) == m)
  }
}
