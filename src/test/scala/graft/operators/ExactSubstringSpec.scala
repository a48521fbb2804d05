package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the exact substring dedup: the emitted spans are VERBATIM
  * duplicated in the corpus, TRUE-MAXIMAL (inextensible either way —
  * the anchor-doubling extension resolves spans past the first band's
  * cap), coverage equals the brute-force union over all duplicated
  * ≥L-token substrings, and the removal digest matches a hand removal. */
class ExactSubstringSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- ladder unit invariants ----------------

  test("ladder fingerprints: equal substrings <-> equal anchors, order-sensitive") {
    val a = "the quick brown fox jumps over the lazy dog the quick brown cat".split(" ").toSeq
    val l = ExactSubstring.ladder(a, 3)
    // level k entry p fingerprints a.slice(p, p+2^k): recompute independently
    for (k <- 0 to 3; p <- l(k).indices) {
      val expect = a.slice(p, p + (1 << k))
      for (q <- l(k).indices) {
        val same = a.slice(q, q + (1 << k)) == expect
        assert((l(k)(p) == l(k)(q)) == same,
          s"level $k: positions $p/$q fingerprint equality != substring equality")
      }
    }
    // combiner is order-sensitive
    assert(ExactSubstring.hash2(1L, 2L) != ExactSubstring.hash2(2L, 1L))
  }

  // ---------------- end-to-end span properties ----------------

  // corpus with planted structure (L=3, C=8):
  //   docs 1/2 share an exact 6-token run (a maximal repeat)
  //   doc 3 repeats a 4-token phrase INTERNALLY twice
  //   docs 4/5 share a 12-token run (> band cap 8 -> exercises the
  //   anchor-doubling extension: true length must be reported)
  //   doc 6 is all-unique filler
  private val corpus: Seq[(Long, Seq[String])] = Seq(
    (1L, "x1 x2 alpha beta gamma delta epsilon zeta x3 x4".split(" ").toSeq),
    (2L, "y1 alpha beta gamma delta epsilon zeta y2 y3 y4".split(" ").toSeq),
    (3L, "p q one two three four r s one two three four t".split(" ").toSeq),
    (4L, ("a1 " + (1 to 12).map(i => s"c$i").mkString(" ") + " a2").split(" ").toSeq),
    (5L, ("b1 b2 " + (1 to 12).map(i => s"c$i").mkString(" ") + " b3").split(" ").toSeq),
    (6L, "u1 u2 u3 u4 u5 u6 u7 u8 u9".split(" ").toSeq))

  private val L = 3
  private val C = 8

  /** Corpus-wide occurrence count of a token slice. */
  private def occ(slice: Seq[String]): Int =
    corpus.map { case (_, t) =>
      (0 to t.length - slice.length).count(i => t.slice(i, i + slice.length) == slice)
    }.sum

  private def tokensOf(d: Long): Seq[String] = corpus.find(_._1 == d).get._2

  private lazy val spansOut = {
    val df = corpus.toDF("doc_id", "toks")
    ExactSubstring.dupSpans(df, col("doc_id"), col("toks"), minLen = L, maxLen = C)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt,
        r.getLong(3) == 1L))
      .toSeq // (doc, start, len, leftMax)
  }

  test("every emitted span is verbatim-duplicated in the corpus") {
    assert(spansOut.nonEmpty)
    spansOut.foreach { case (d, s, len, _) =>
      val slice = tokensOf(d).slice(s - 1, s - 1 + len)
      assert(slice.length == len, s"doc $d span at $s overruns the doc")
      assert(occ(slice) >= 2, s"doc $d span [$s,+$len) '$slice' occurs once")
    }
  }

  test("spans are right-maximal (inextensible) — including past the band cap") {
    spansOut.foreach { case (d, s, len, _) =>
      val t = tokensOf(d)
      if (s - 1 + len < t.length) {
        val ext = t.slice(s - 1, s - 1 + len + 1)
        assert(occ(ext) < 2, s"doc $d span at $s extends right to ${len + 1}")
      }
    }
  }

  test("a >cap planted duplicate reports its TRUE maximal length") {
    // docs 4/5 share the 12-token c1..c12 run; band cap C=8 forces the
    // anchor-doubling extension ([9,16]) to resolve it
    val run4 = spansOut.find { case (d, s, _, _) => d == 4L && s == 2 }.get
    val run5 = spansOut.find { case (d, s, _, _) => d == 5L && s == 3 }.get
    assert(run4._3 == 12, s"doc 4 run head length: $run4")
    assert(run5._3 == 12, s"doc 5 run head length: $run5")
    assert(spansOut.forall(_._3 <= 12) && spansOut.exists(_._3 > C))
  }

  test("left_max flags exactly the spans no earlier start absorbs (exact, " +
       "no cap convention)") {
    val measured = spansOut.map { case (d, s, len, _) => ((d, s), len) }.toMap
    spansOut.foreach { case (d, s, len, leftMax) =>
      val prev = measured.get((d, s - 1))
      val absorbable = prev.exists(pl => pl >= len + 1)
      assert(leftMax == !absorbable,
        s"doc $d span at $s len $len: left_max=$leftMax absorbable=$absorbable")
      // the flag is EXACT against string truth everywhere now
      val t = tokensOf(d)
      val ext = t.slice(s - 2, s - 2 + len + 1)
      val trueAbsorb = s > 1 && prev.nonEmpty &&
        ext.length == len + 1 && occ(ext) >= 2
      assert(leftMax == !trueAbsorb,
        s"doc $d span at $s len $len: string-truth mismatch")
    }
  }

  test("per-position lengths are the exact UNCAPPED maxima (brute-force parity)") {
    val brute = for {
      (d, t) <- corpus
      p <- 1 to t.length
      lens = (L to (t.length - p + 1))
        .filter(m => occ(t.slice(p - 1, p - 1 + m)) >= 2)
      if lens.nonEmpty
    } yield ((d, p), lens.max)
    val got = spansOut.map { case (d, s, len, _) => ((d, s), len) }.toMap
    assert(got == brute.toMap)
  }

  test("dedupStats: coverage union + removal digest match a hand removal") {
    val df = corpus.toDF("doc_id", "toks")
    val stats = ExactSubstring.dedupStats(df, col("doc_id"), col("toks"),
        minLen = L, maxLen = C)
      .collect().map(r => r.getLong(0) -> r).toMap
    // brute coverage: union over ALL duplicated >=L substrings (cap-free:
    // the cap must not change coverage — the documented invariant)
    corpus.foreach { case (d, t) =>
      val covered = (for {
        p <- 1 to t.length
        m <- L to (t.length - p + 1)
        if occ(t.slice(p - 1, p - 1 + m)) >= 2
        i <- p until p + m
      } yield i).toSet
      val r = stats(d)
      assert(r.getLong(1) == t.length.toLong, s"doc $d n_tokens")
      assert(r.getLong(4) == covered.size.toLong,
        s"doc $d covered: got ${r.getLong(4)}, brute ${covered.size}")
      val kept = (1 to t.length).filterNot(covered).map(i => t(i - 1))
      val keptMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(6) == keptMd5, s"doc $d kept_md5")
    }
    // the all-unique doc keeps everything
    assert(stats(6L).getLong(4) == 0L && stats(6L).getLong(2) == 0L)
    // docs 4/5 exceed the band cap: max_len is the TRUE 12-token run
    assert(stats(4L).getLong(3) == 12L)
    assert(stats(5L).getLong(3) == 12L)
    // and the >cap run is ONE maximal repeat, not a cap-fragmented chain
    assert(stats(4L).getLong(2) == 1L, "doc 4 span count")
  }
}
