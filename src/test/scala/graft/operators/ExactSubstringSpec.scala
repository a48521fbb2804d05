package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the exact substring dedup: the emitted spans are VERBATIM
  * duplicated in the corpus, MAXIMAL (inextensible either way below the
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
  //   docs 4/5 share a 12-token run (> cap 8 -> capped spans)
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
        r.getLong(3) == 1L, r.getLong(4) == 1L))
      .toSeq // (doc, start, len, capped, leftMax)
  }

  test("every emitted span is verbatim-duplicated in the corpus") {
    assert(spansOut.nonEmpty)
    spansOut.foreach { case (d, s, len, _, _) =>
      val slice = tokensOf(d).slice(s - 1, s - 1 + len)
      assert(slice.length == len, s"doc $d span at $s overruns the doc")
      assert(occ(slice) >= 2, s"doc $d span [$s,+$len) '$slice' occurs once")
    }
  }

  test("spans are right-maximal (inextensible) below the cap") {
    spansOut.foreach { case (d, s, len, capped, _) =>
      val t = tokensOf(d)
      if (!capped && s - 1 + len < t.length) {
        val ext = t.slice(s - 1, s - 1 + len + 1)
        assert(occ(ext) < 2, s"doc $d span at $s extends right to ${len + 1}")
      }
      if (capped) assert(len == C)
    }
  }

  test("left_max flags exactly the spans no earlier start absorbs " +
       "(capped predecessors conservatively absorb)") {
    // capped measured length at (doc, p): min(true maxdup, C)
    val measured = spansOut.map { case (d, s, len, _, _) => ((d, s), len) }.toMap
    spansOut.foreach { case (d, s, len, _, leftMax) =>
      val prev = measured.get((d, s - 1))
      val absorbable = prev.exists(pl => pl >= len + 1 || pl == C)
      assert(leftMax == !absorbable,
        s"doc $d span at $s len $len: left_max=$leftMax absorbable=$absorbable")
      // below the cap the flag is EXACT against uncapped string truth
      if (prev.forall(_ < C)) {
        val t = tokensOf(d)
        val ext = t.slice(s - 2, s - 2 + len + 1)
        val trueAbsorb = s > 1 && prev.nonEmpty &&
          ext.length == len + 1 && occ(ext) >= 2
        assert(leftMax == !trueAbsorb,
          s"doc $d span at $s len $len: uncapped truth mismatch")
      }
    }
  }

  test("per-position lengths are the exact maxima (brute-force parity)") {
    // brute maxdup for every position of every doc, capped at C
    val brute = for {
      (d, t) <- corpus
      p <- 1 to t.length
      lens = (L to math.min(C, t.length - p + 1))
        .filter(m => occ(t.slice(p - 1, p - 1 + m)) >= 2)
      if lens.nonEmpty
    } yield ((d, p), lens.max)
    val got = spansOut.map { case (d, s, len, _, _) => ((d, s), len) }.toMap
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
    // docs 4/5 hit the cap: max_len == C, coverage still the full 12-run
    assert(stats(4L).getLong(3) == C.toLong)
  }
}
