package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
    "while birds sing in the tall green trees under a bright morning sun"
  private val nearDup = base + " today"
  private val other = "completely different content about spark catalyst optimizer rules " +
    "predicate pushdown column pruning broadcast joins and shuffle partitions"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, other), (3L, base)
  ).toDF("doc_id", "text")

  test("incrementalAdmit gates a batch against history without history pairs") {
    val history = Seq((0L, base), (1L, other)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),            // exact dup of history doc 0
      (11L, nearDup),         // near-dup (1 appended word) of history doc 0
      (12L, "fresh content entirely unlike anything stored with many new words " +
        "about distributed query engines and columnar storage formats"),
      (13L, "fresh content entirely unlike anything stored with many new words " +
        "about distributed query engines and columnar storage formats"), // dup of 12 within batch
      (14L, "another genuinely novel document describing watermark semantics " +
        "in streaming systems with stateful operators and exactly once sinks")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalAdmit(batch, history, col("doc_id"), col("text"),
        maxHamming = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out(10L)._1 == 1L && out(10L)._4 == 0L, "exact history dup must be rejected")
    assert(out(11L)._3 == 1L && out(11L)._4 == 0L, "near history dup must be rejected")
    assert(out(12L) == ((0L, 0L, 0L, 1L)), "first fresh doc admitted")
    assert(out(13L)._2 == 1L && out(13L)._4 == 0L, "within-batch dup rejected, first kept")
    assert(out(14L) == ((0L, 0L, 0L, 1L)), "novel doc admitted")
    // asymmetry: admission says nothing about history (no history rows out)
    assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L))
  }

  test("exactByContent groups identical normalized docs") {
    val g = Dedup.exactByContent(docs, col("doc_id"), col("text"))
    val grp = g.filter(col("dups") === 2).collect()
    assert(grp.length == 1 && grp(0).getAs[Long]("keep_id") == 0L)
  }

  test("sortedIntersectSize equals size(array_intersect) on random sorted arrays") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.ArrayExprs.sortedIntersectSize(col("a"), col("b")).as("x"),
      size(array_intersect(col("a"), col("b"))).as("y"))
    assert(got.filter(col("x") =!= col("y")).count() == 0)
  }

  test("jaccardArrays exact") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val j = df.select(Dedup.jaccardArrays(col("a"), col("b")).as("j")).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("minhash LSH finds planted near-duplicates, not unrelated docs") {
    val pairs = Dedup.minhashDedupPairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)), s"exact dup pair missing: $pairs")
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L)),
      s"near dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"false positive: $pairs")
  }

  test("simhash of identical docs is identical; near-dups within small hamming") {
    val sh = Dedup.simhashFingerprints(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(3L))
    val hd = java.lang.Long.bitCount(sh(0L) ^ sh(1L))
    val hdOther = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(hd <= 8, s"near-dup hamming $hd")
    assert(hdOther > hd, s"unrelated doc closer ($hdOther) than near-dup ($hd)")
  }

  test("simhashDedupPairs finds the planted cluster") {
    val pairs = Dedup.simhashDedupPairs(docs, col("doc_id"), col("text"), maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)) && pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash chunk blocking: pigeonhole guarantees a shared chunk at the configured radius") {
    val rnd = new scala.util.Random(23)
    for (maxHamming <- Seq(3, 7, 16)) {
      val bounds = Dedup.simhashChunkBounds(maxHamming)
      assert(bounds.map(_._2).sum == 64, "chunks must cover all 64 bits")
      assert(bounds.head._1 == 0)
      bounds.sliding(2).foreach {
        case Seq((o1, w1), (o2, _)) => assert(o2 == o1 + w1, "chunks must be contiguous")
        case _ =>
      }
      def chunksOf(fp: Long): Seq[Long] = bounds.map { case (off, w) =>
        val mask = if (w == 64) -1L else (1L << w) - 1L
        (fp >>> off) & mask
      }
      for (_ <- 0 until 200) {
        val a = rnd.nextLong()
        val flipped = rnd.shuffle((0 until 64).toList).take(maxHamming)
        val b = flipped.foldLeft(a)((x, i) => x ^ (1L << i))
        assert(chunksOf(a).zip(chunksOf(b)).exists { case (x, y) => x == y },
          s"radius $maxHamming: planted pair at hamming $maxHamming shares no chunk")
      }
    }
  }

  test("MIH blocking plan: some chunk within per-chunk radius q at the full radius") {
    val rnd = new scala.util.Random(29)
    for (maxHamming <- Seq(1, 3, 7, 16)) {
      val (bounds, q) = Dedup.simhashBlockingPlan(maxHamming)
      assert(bounds.map(_._2).sum == 64)
      assert(bounds.length * (q + 1) > maxHamming, "pigeonhole arithmetic")
      def chunksOf(fp: Long): Seq[Long] = bounds.map { case (off, w) =>
        val mask = if (w == 64) -1L else (1L << w) - 1L
        (fp >>> off) & mask
      }
      for (_ <- 0 until 300) {
        val a = rnd.nextLong()
        val flipped = rnd.shuffle((0 until 64).toList).take(maxHamming)
        val b = flipped.foldLeft(a)((x, i) => x ^ (1L << i))
        assert(chunksOf(a).zip(chunksOf(b)).exists { case (x, y) =>
          java.lang.Long.bitCount(x ^ y) <= q
        }, s"radius $maxHamming: pair at hamming $maxHamming has no chunk within $q")
      }
    }
  }

  test("simhashDedupPairs at radius 7 equals the exact all-pairs hamming filter") {
    import org.apache.spark.sql.functions.col
    val words = base.split(" ")
    // graded variants: replace the first k words -> a spread of hamming distances
    val variants = (1 to 8).map { k =>
      (10L + k, (words.indices.map(i => if (i < k) s"sub$i" else words(i))).mkString(" "))
    }
    val d = (Seq((0L, base), (1L, nearDup), (2L, other), (3L, base)) ++ variants)
      .toDF("doc_id", "text")
    val fps = Dedup.simhashFingerprints(d, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    val ids = fps.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 7
    } yield (i, j)).toSet
    val got = Dedup.simhashDedupPairs(d, col("doc_id"), col("text"), maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected, s"got $got expected $expected")
    assert(expected.nonEmpty, "fixture should plant at least one pair within radius")
  }

  test("PortableHash.md5Long matches the first-16-hex-digits-of-md5 integer") {
    // md5("hello") = 5d41402abc4b2a76... -> 0x5d41402abc4b2a76 as signed i64
    val got = graft.functions.PortableHash.md5Long(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
    assert(got == 0x5d41402abc4b2a76L)
  }

  test("portable simhash mode: pairs equal the exact all-pairs filter too") {
    import org.apache.spark.sql.functions.col
    val words = base.split(" ")
    val variants = (1 to 8).map { k =>
      (10L + k, (words.indices.map(i => if (i < k) s"sub$i" else words(i))).mkString(" "))
    }
    val d = (Seq((0L, base), (1L, nearDup), (2L, other), (3L, base)) ++ variants)
      .toDF("doc_id", "text")
    val fps = Dedup.simhashFingerprints(d, col("doc_id"), col("text"), portable = true)
      .as[(Long, Long)].collect().toMap
    val xxFps = Dedup.simhashFingerprints(d, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(fps != xxFps, "portable hash should differ from xxhash64 fingerprints")
    val ids = fps.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 7
    } yield (i, j)).toSet
    val got = Dedup.simhashDedupPairs(d, col("doc_id"), col("text"),
      maxHamming = 7, portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("ngramJaccardPairs pairs equal-ngram-set docs across length buckets") {
    // Periodic texts: identical distinct 3-gram sets, lengths one bucket
    // apart (80 vs 100 chars with 1.25-ratio buckets: 19 vs 20). A gid
    // keyed on the set alone would collapse them into "the same group" and
    // the g_a < g_b candidate filter would drop the pair despite
    // jaccard = 1.0.
    val unit = "buy cheap stuff now "
    val d = Seq((0L, unit * 4), (1L, unit * 5), (2L, other)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"),
      n = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"equal-set cross-bucket pair missing: $pairs")
  }

  test("clusters converges on a long chain (beyond the old iteration cap)") {
    // Path graph 0-1-2-...-40: diameter 40 > the previous maxIters=20;
    // pointer jumping must still converge and label every node 0.
    val n = 41
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("id_a", "id_b")
    val ids = (0 until n).map(_.toLong).toDF("doc_id")
    val labels = Dedup.clusters(pairs, ids).as[(Long, Long)].collect().toMap
    assert(labels.size == n && labels.values.forall(_ == 0L), s"bad labels: $labels")
  }

  test("ngramJaccardPairs finds near-dups within blocks") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
  }

  test("ngramJaccardPairs finds cross-bucket pairs regardless of id order") {
    // The LONGER doc gets the LOWER id: base and nearDup land in adjacent
    // length buckets, so a one-sided {lb, lb+1} explode would drop the pair
    // (the lower-id doc sits a bucket above the higher-id one).
    val d = Seq((0L, nearDup), (1L, base), (2L, other)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"),
      n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"cross-bucket near-dup missing: $pairs")
  }

  test("clusters: min-label connected components with singletons intact") {
    // components: {0,1,2} via a chain (diameter 2), {5,6}; 3,4,7 singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val ids = (0L to 7L).toDF("doc_id")
    val got = Dedup.clusters(pairs, ids)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L), s"got $got")
  }

  test("clusters runs ≤ 2 actions per round (convergence count rides the jump job)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val ids = (0L to 7L).toDF("doc_id")
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit = {
        actions.incrementAndGet(); ()
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val (labels, rounds) = Dedup.clustersWithRounds(pairs, ids)
      assert(labels.count() == 8)
      // listener events are async — wait for the bus to drain
      var last = -1
      while (actions.get() != last) { last = actions.get(); Thread.sleep(300) }
      // budget: 2 setup checkpoints (edges, labels) + 2 ACTIONS per round
      // (propagate checkpoint + jump checkpoint; the convergence test is an
      // accumulator filled inside the jump job, not a third action) + 1 for
      // the count() above. The old shape spent a 3rd action per round on a
      // limit(1).count convergence probe.
      val budget = 2 + 2 * rounds + 1
      assert(actions.get() <= budget,
        s"clusters ran ${actions.get()} actions for $rounds rounds (budget $budget)")
    } finally spark.listenerManager.unregister(listener)
  }

  test("embeddingNearDupPairs finds duplicated vectors") {
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val rows = Seq((0L, v0.toSeq), (1L, v0.map(x => x * 1.001f).toSeq)) ++
      (2 until 30).map(i => (i.toLong, vec().toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"missing planted near-dup: $pairs")
  }

  test("embeddingNearDupPairs: identical all-zero vectors never pair as near-dups") {
    // failed-embedding sentinels collapse into one distinct-vector group;
    // their pair must score 0.0 (the cosine zero-vector guard), not a
    // fabricated 1.0
    val rows = Seq((0L, Seq.fill(8)(0f)), (1L, Seq.fill(8)(0f)),
      (2L, Seq.tabulate(8)(_.toFloat)))
    val pairs = Dedup.embeddingNearDupPairs(rows.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((0L, 1L)), s"zero-vector pair leaked: $pairs")
  }

  test("embeddingNearDupPairs: banded LSH recalls perturbed near-dups and " +
       "candidate count scales with output, not n²") {
    val dim = 32
    def fixture(nClusters: Int): DataFrame = {
      val rnd = new scala.util.Random(7)
      val rows = (0 until nClusters).flatMap { c =>
        val base = Array.fill(dim)(rnd.nextGaussian())
        // 3-doc near-dup clusters: base + two deterministic perturbations
        // (multiplicative, cosine ≈ 0.98–0.99 — NOT bit-identical, so the
        // banding itself is exercised, not the distinct-vector collapse)
        Seq(
          (c * 10L, base.toSeq),
          (c * 10L + 1, base.zipWithIndex.map { case (x, i) =>
            x * (1 + 0.15 * ((i % 3) - 1)) }.toSeq),
          (c * 10L + 2, base.zipWithIndex.map { case (x, i) =>
            x * (1 - 0.15 * ((i % 2) * 2 - 1)) }.toSeq))
      }
      rows.toDF("vec_id", "embedding")
    }
    def found(df: DataFrame): Long =
      Dedup.embeddingNearDupPairs(df, col("vec_id"), col("embedding"),
        threshold = 0.9).count()
    def candidates(df: DataFrame): Long =
      Dedup.embeddingGroupsAndCandidates(df, col("vec_id"),
        col("embedding"))._2.count()
    val smallDf = fixture(40) // 120 vectors, 40 near-dup clusters
    val largeDf = fixture(80) // 240 vectors, 80 near-dup clusters
    // recall: all 3 intra-cluster pairs per cluster must be found
    assert(found(smallDf) == 40L * 3)
    assert(found(largeDf) == 80L * 3)
    // candidate volume tracks the OUTPUT (duplicate clusters), not corpus²:
    // doubling the corpus doubles true pairs, so candidates may at most
    // double plus random-collision noise — quadratic generation would 4×.
    val cs = candidates(smallDf)
    val cl = candidates(largeDf)
    assert(cl <= 2 * cs + 60,
      s"candidate growth super-linear: $cs -> $cl on 2x corpus")
  }

  test("embeddingIncrementalAdmit gates a vector batch against history") {
    // history: 4 orthogonal unit vectors; batch plants one of each case
    val history = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("doc_id", "v")
    val novel = Seq(1.0, 1.0, 1.0, 1.0) // cosine 0.5 vs every history vector
    val batch = Seq(
      (10L, Seq(1.0, 0.05, 0.0, 0.0)), // near-dup of history 1 (cos ≈ 0.999)
      (11L, Seq(0.0, 1.0, 0.0, 0.0)),  // bit-identical to history 2
      (12L, novel),                    // first copy of a novel vector
      (13L, novel),                    // within-batch duplicate of 12
      (14L, Seq(-1.0, 1.0, -1.0, 1.0)) // genuinely novel
    ).toDF("doc_id", "v")
    val got = Dedup.embeddingIncrementalAdmit(batch, history,
        col("doc_id"), col("v"), threshold = 0.95)
      .select("doc_id", "exact_hist", "exact_batch", "near_hist", "admitted")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(10L) == ((0L, 0L, 1L, 0L)), s"near-dup: ${got(10L)}")
    // bit-identical vector is also cosine-1.0 near (hamming-0 ⊆ near, the
    // text-gate convention)
    assert(got(11L) == ((1L, 0L, 1L, 0L)), s"exact-hist: ${got(11L)}")
    assert(got(12L) == ((0L, 0L, 0L, 1L)), s"first novel copy: ${got(12L)}")
    assert(got(13L) == ((0L, 1L, 0L, 0L)), s"batch dup: ${got(13L)}")
    assert(got(14L) == ((0L, 0L, 0L, 1L)), s"novel: ${got(14L)}")
  }

  test("hyperplane sketches: broadcast transport is bit-identical to the " +
       "literal form, and the large-dim dedup path still recalls twins") {
    val dim = 768 // 16·16·768 = 196,608 > BroadcastPlanesThreshold (2¹⁷)
    assert(16 * 16 * dim > Dedup.BroadcastPlanesThreshold)
    val rnd = new scala.util.Random(13)
    val planes = Array.fill(16 * 16 * dim)(rnd.nextGaussian())
    val base = Array.fill(dim)(rnd.nextGaussian())
    val rows = Seq(
      (0L, base.toSeq),
      (1L, base.zipWithIndex.map { case (x, i) => x * (1 + 0.1 * ((i % 3) - 1)) }.toSeq)) ++
      (2 until 10).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val lit0 = df.select(col("vec_id"),
        graft.functions.VectorExprs.hyperplaneSketches(col("v"), planes, 16, 16).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    val bc = df.select(col("vec_id"),
        graft.functions.VectorExprs.hyperplaneSketchesBc(col("v"),
          spark.sparkContext.broadcast(planes), 16, 16).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(lit0 == bc, "broadcast sketches diverged from literal sketches")
    // end-to-end: the operator auto-selects the broadcast path at this dim
    // and the planted twin still surfaces
    val pairs = Dedup.embeddingNearDupPairs(df, col("vec_id"), col("v"),
        threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"missing twin via broadcast path: $pairs")
  }

  test("segmentDedup drops cross-doc duplicated segments and reassembles the rest") {
    // segLen = 3: doc 0 and doc 1 share their FIRST segment ("a b c");
    // doc 2 repeats a segment internally (must survive — only 1 distinct
    // doc); doc 3 is empty; doc 4 is a short tail-only doc.
    val corpus = Seq(
      (0L, "a b c d e f g"),        // segs: [a b c][d e f][g]
      (1L, "a b c x y z"),          // segs: [a b c][x y z]
      (2L, "p q r p q r"),          // segs: [p q r][p q r] — internal repeat
      (3L, ""),
      (4L, "h i")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(corpus, col("doc_id"),
        graft.functions.TextOps.tokens(col("text")), segLen = 3, maxDocs = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_segments", "n_dropped_segments", "n_kept_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 7L, 3L, 1L, 4L),   // lost [a b c], kept "d e f g"
      (1L, 6L, 2L, 1L, 3L),   // lost [a b c], kept "x y z"
      (2L, 6L, 2L, 0L, 6L),   // internal repeat survives
      (3L, 0L, 0L, 0L, 0L),
      (4L, 2L, 1L, 0L, 2L)), s"unexpected: $out")
    // content digest: doc 0's reassembled text is exactly "d e f g"
    val md = Dedup.segmentDedup(corpus, col("doc_id"),
        graft.functions.TextOps.tokens(col("text")), segLen = 3, maxDocs = 1)
      .filter(col("doc_id") === 0L).select("kept_md5").as[String].head()
    val expected = spark.sql("SELECT md5(cast('d e f g' AS binary))").as[String].head()
    assert(md == expected)
  }
}
