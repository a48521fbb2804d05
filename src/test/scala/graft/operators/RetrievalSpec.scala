package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // N=4, avgdl=3, df(cat)=df(dog)=2 => idf = ln 2 for both terms
  private def corpus = Seq(
    (0L, Seq("cat", "cat", "dog", "x")),
    (1L, Seq("cat", "x", "y", "z")),
    (2L, Seq("x", "y")),
    (3L, Seq("dog", "dog"))
  ).toDF("doc_id", "toks")

  private def bm25(tf: Double, dl: Double, idf: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double =
    idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / 3.0))

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("bm25TopK matches closed-form scores, excludes no-hit docs") {
    val out = Retrieval.bm25TopK(corpus, col("doc_id"), col("toks"),
        Seq("cat", "dog"), k = 10)
      .as[(Long, Double)].collect().toMap
    val idf = math.log(2.0)
    assert(out.keySet == Set(0L, 1L, 3L)) // doc2 has no query term
    assert(out(0L) == r6(bm25(2, 4, idf) + bm25(1, 4, idf)))
    assert(out(1L) == r6(bm25(1, 4, idf)))
    assert(out(3L) == r6(bm25(2, 2, idf)))
    // saturation + length norm: doc0 (both terms) beats single-term docs
    assert(out(0L) > out(3L) && out(3L) > out(1L))
  }

  test("bm25fTopK: no anchors degenerates exactly to bm25TopK") {
    val empty = Seq.empty[(Long, String, Long)]
      .toDF("aid", "anchor", "cnt")
    val out = Retrieval.bm25fTopK(corpus, col("doc_id"), col("toks"),
        empty, col("aid"), col("anchor"), col("cnt"),
        Seq("cat", "dog"), k = 10)
      .as[(Long, Double, Double)].collect()
    val scan = Retrieval.bm25TopK(corpus, col("doc_id"), col("toks"),
        Seq("cat", "dog"), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap == scan)
    out.foreach { case (_, f, b) => assert(f == b) } // fused == body-only
  }

  test("bm25fTopK: anchor field re-ranks and inlink counts weight it") {
    // doc 2 has NO query term in its body but 3 inlinks calling it
    // "cat" — it must surface, outrank the weak body-only doc 1, and
    // report bm25_body = 0-signal absence via the pre-filter (body tf 0)
    val anchors = Seq(
      (2L, "cat", 3L),  // 3 pages call doc2 "cat"
      (3L, "dog", 1L)   // 1 page calls doc3 "dog"
    ).toDF("aid", "anchor", "cnt")
    val out = Retrieval.bm25fTopK(corpus, col("doc_id"), col("toks"),
        anchors, col("aid"), col("anchor"), col("cnt"),
        Seq("cat", "dog"), k = 10, wAnchor = 2.0)
      .as[(Long, Double, Double)].collect()
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId.keySet == Set(0L, 1L, 2L, 3L))
    val (f2, b2) = byId(2L)
    assert(b2 == 0.0, "doc2 has no body signal")
    assert(f2 > 0.0, "anchor evidence alone must score doc2")
    assert(f2 > byId(1L)._1, "anchor-only doc2 outranks weak-body doc1")
    // doc3: anchor evidence ADDS to its body score
    assert(byId(3L)._1 > byId(3L)._2)
    // closed-form check for doc2: dla=3 (3 × 1-token phrase), avgdla over
    // {3, 1} = 2; tft = 2·3/(0.25+0.75·3/2) = 6/1.375; idf = ln 2
    val tft = 2.0 * 3.0 / (0.25 + 0.75 * 3.0 / 2.0)
    assert(f2 == r6(math.log(2.0) * tft * 2.2 / (tft + 1.2)))
  }

  test("bm25fTopKIndexed equals the scan path bit-for-bit incl. " +
       "anchor-only candidates") {
    val big = (0L until 60L).map { i =>
      val extra = if (i % 3 == 0) Seq("cat") else if (i % 3 == 1) Seq("dog")
                  else Seq.empty
      (i, Seq(s"w$i", s"u${i % 7}", s"v${i % 11}") ++ extra)
    }.toDF("doc_id", "toks")
    // doc 2 (i%3==2: NO query term in body) gets heavy anchor evidence —
    // it must surface through the index path's full-outer candidate union
    val anchors = Seq((2L, "cat", 5L), (9L, "dog cat", 2L))
      .toDF("aid", "anchor", "cnt")
    val dir = java.nio.file.Files.createTempDirectory("bm25fidx").toString
    try {
      Retrieval.writeBm25Index(big, col("doc_id"), col("toks"), dir,
        buckets = 16)
      val scan = Retrieval.bm25fTopK(big, col("doc_id"), col("toks"),
          anchors, col("aid"), col("anchor"), col("cnt"),
          Seq("cat", "dog"), k = 15, wAnchor = 2.0)
        .as[(Long, Double, Double)].collect().toSeq
      val idx = Retrieval.bm25fTopKIndexed(spark, dir,
          anchors, col("aid"), col("anchor"), col("cnt"),
          Seq("cat", "dog"), k = 15, wAnchor = 2.0, buckets = 16)
        .as[(Long, Double, Double)].collect().toSeq
      assert(idx == scan, s"indexed != scan:\n$idx\n$scan")
      assert(scan.exists { case (id, f, b) => id == 2L && b == 0.0 && f > 0 },
        "anchor-only doc must surface with zero body score")
    } finally {
      import java.nio.file.{Files, Paths}
      val walk = Files.walk(Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("bm25fScoresIndexed: round6(raw) IS the cut path's bm25f, " +
       "candidate set identical") {
    val big = (0L until 60L).map { i =>
      val extra = if (i % 3 == 0) Seq("cat") else if (i % 3 == 1) Seq("dog")
                  else Seq.empty
      (i, Seq(s"w$i", s"u${i % 7}", s"v${i % 11}") ++ extra)
    }.toDF("doc_id", "toks")
    val anchors = Seq((2L, "cat", 5L), (9L, "dog cat", 2L))
      .toDF("aid", "anchor", "cnt")
    val dir = java.nio.file.Files.createTempDirectory("bm25fraw").toString
    try {
      Retrieval.writeBm25Index(big, col("doc_id"), col("toks"), dir,
        buckets = 16)
      val cut = Retrieval.bm25fTopKIndexed(spark, dir,
          anchors, col("aid"), col("anchor"), col("cnt"),
          Seq("cat", "dog"), k = 1000, wAnchor = 2.0, buckets = 16)
        .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      val raw = Retrieval.bm25fScoresIndexed(spark, dir,
          anchors, col("aid"), col("anchor"), col("cnt"),
          Seq("cat", "dog"), wAnchor = 2.0, buckets = 16)
        .select(col("doc_id"), round(col("bm25f_raw"), 6),
          round(col("bm25_body_raw"), 6))
        .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      assert(raw == cut, s"raw-rounded != cut:\n$raw\n$cut")
    } finally {
      import java.nio.file.{Files, Paths}
      val walk = Files.walk(Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("blendStaticPrior: prior promotes past higher text score, " +
       "missing domain blends 0, cut is deterministic") {
    // doc 2's weaker text score rides domain b's strong prior past
    // doc 1; doc 3's domain has no prior row and must blend with 0.0
    val scored = Seq((1L, 2.0), (2L, 1.5), (3L, 1.9))
      .toDF("doc_id", "raw")
    val prior = Seq(("a", 0.1), ("b", 0.3)).toDF("domain", "p")
    val domainOf = when(col("doc_id") === 1L, "a")
      .when(col("doc_id") === 2L, "b").otherwise("zzz")
    val got = Retrieval.blendStaticPrior(scored, col("raw"), domainOf,
        prior, col("domain"), col("p"), lambda = 10.0, k = 3)
      .as[(Long, String, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (2L, "b", 0.3, 1.5, 4.5),
      (1L, "a", 0.1, 2.0, 3.0),
      (3L, "zzz", 0.0, 1.9, 1.9)), got.toString)
    // the cut happens AFTER the blend: k=1 keeps the blended winner,
    // not the text-score winner
    val top = Retrieval.blendStaticPrior(scored, col("raw"), domainOf,
        prior, col("domain"), col("p"), lambda = 10.0, k = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(2L))
  }

  test("k cut is deterministic with doc_id tie-break") {
    // docs 10 and 11 are identical => identical scores; k=2 must keep the
    // top scorer and then the LOWER id of the tied pair
    val df = Seq(
      (5L, Seq("cat", "cat")),
      (10L, Seq("cat", "x")),
      (11L, Seq("cat", "x"))
    ).toDF("doc_id", "toks")
    val got = Retrieval.bm25TopK(df, col("doc_id"), col("toks"),
      Seq("cat"), k = 2).as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == Seq(5L, 10L))
  }

  test("duplicate query terms collapse; results invariant to partitioning") {
    val a = Retrieval.bm25TopK(corpus.repartition(5), col("doc_id"),
      col("toks"), Seq("cat", "dog", "cat"), k = 10).collect().toSeq
    val b = Retrieval.bm25TopK(corpus.coalesce(1), col("doc_id"),
      col("toks"), Seq("cat", "dog"), k = 10).collect().toSeq
    assert(a == b)
  }

  test("plan is scan-only: top-k via TakeOrderedAndProject, no shuffle join") {
    // corpus must be LARGER than k, else EliminateLimits removes the limit
    // (maxRows <= k) and no top-k operator is needed at all
    val big = (0L until 50L).map(i => (i, Seq("cat", s"w$i", "dog")))
      .toDF("doc_id", "toks")
    val df = Retrieval.bm25TopK(big, col("doc_id"), col("toks"),
      Seq("cat", "dog"), k = 5)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  test("incrementally appended index equals the scan path; retries are idempotent") {
    val big = (0L until 90L).map { i =>
      val extra = if (i % 3 == 0) Seq("cat") else if (i % 3 == 1) Seq("dog") else Seq.empty
      (i, Seq(s"w$i", s"u${i % 5}", s"v${i % 13}") ++ extra)
    }.toDF("doc_id", "toks")
    val dir = java.nio.file.Files.createTempDirectory("bm25inc").toString
    try {
      // three ingest batches append their postings + stats partials
      Seq(0L, 1L, 2L).foreach { b =>
        Retrieval.appendBm25Postings(
          big.filter(col("doc_id") % 3 === b), col("doc_id"), col("toks"),
          dir, batchId = b, buckets = 16)
      }
      // a retried batch replaces its own partitions instead of duplicating
      Retrieval.appendBm25Postings(
        big.filter(col("doc_id") % 3 === 1L), col("doc_id"), col("toks"),
        dir, batchId = 1L, buckets = 16)
      val scan = Retrieval.bm25TopK(big, col("doc_id"), col("toks"),
        Seq("cat", "dog"), k = 20).as[(Long, Double)].collect().toSeq
      val idx = Retrieval.bm25TopKIndexed(spark, dir, Seq("cat", "dog"),
        k = 20, buckets = 16).as[(Long, Double)].collect().toSeq
      assert(idx == scan, s"appended index != scan:\n$idx\n$scan")
    } finally {
      import java.nio.file.{Files, Paths}
      val walk = Files.walk(Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("compaction: identical results, fewer files, folded-replay no-op, appends keep working") {
    import java.nio.file.{Files, Paths}
    def parquetFiles(p: String): Long = {
      val walk = Files.walk(Paths.get(p))
      try walk.filter(f => f.toString.endsWith(".parquet")).count()
      finally walk.close()
    }
    val big = (0L until 120L).map { i =>
      val extra = if (i % 3 == 0) Seq("cat") else if (i % 3 == 1) Seq("dog") else Seq.empty
      (i, Seq(s"w$i", s"u${i % 5}", s"v${i % 13}") ++ extra)
    }.toDF("doc_id", "toks")
    val dir = Files.createTempDirectory("bm25cmp").toString
    try {
      val old = big.filter(col("doc_id") < 90)
      Seq(0L, 1L, 2L).foreach { b =>
        Retrieval.appendBm25Postings(old.filter(col("doc_id") % 3 === b),
          col("doc_id"), col("toks"), dir, batchId = b, buckets = 16)
      }
      def query() = Retrieval.bm25TopKIndexed(spark, dir, Seq("cat", "dog"),
        k = 20, buckets = 16).as[(Long, Double)].collect().toSeq
      val before = query()
      val filesBefore = parquetFiles(s"$dir/postings")
      Retrieval.compactBm25Postings(spark, dir)
      assert(query() == before, "compaction changed results")
      val filesAfter = parquetFiles(s"$dir/postings")
      assert(filesAfter < filesBefore,
        s"no file-count drop: $filesBefore -> $filesAfter")
      // a replayed, already-folded batch must be a no-op (its rows live in
      // the base partition now)
      Retrieval.appendBm25Postings(old.filter(col("doc_id") % 3 === 1L),
        col("doc_id"), col("toks"), dir, batchId = 1L, buckets = 16)
      assert(query() == before, "folded-batch replay double-counted")
      // a NEW batch after compaction serves correctly over the union
      Retrieval.appendBm25Postings(big.filter(col("doc_id") >= 90),
        col("doc_id"), col("toks"), dir, batchId = 3L, buckets = 16)
      val scan = Retrieval.bm25TopK(big, col("doc_id"), col("toks"),
        Seq("cat", "dog"), k = 20).as[(Long, Double)].collect().toSeq
      assert(query() == scan, "post-compaction append diverged from scan")
      // and the new batch's own retry still replaces, not duplicates
      Retrieval.appendBm25Postings(big.filter(col("doc_id") >= 90),
        col("doc_id"), col("toks"), dir, batchId = 3L, buckets = 16)
      assert(query() == scan, "post-compaction retry double-counted")
    } finally {
      val walk = Files.walk(Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("rrfFuse: closed-form ranks, missing-leg -1, deterministic cut") {
    val bm = Seq((10L, 5.0), (11L, 4.0), (12L, 3.0)).toDF("doc_id", "score")
    val cos = Seq((11L, 0.9), (13L, 0.8), (10L, 0.7)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(Seq("bm25" -> bm, "cos" -> cos), k = 3)
      .orderBy(desc("rrf"), col("doc_id"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc11: bm rank 2, cos rank 1; doc10: bm 1, cos 3; doc12: bm 3; doc13: cos 2
    val exp = Seq(
      (11L, 2L, 1L, r6(1.0 / 62 + 1.0 / 61)),
      (10L, 1L, 3L, r6(1.0 / 61 + 1.0 / 63)),
      (13L, -1L, 2L, r6(1.0 / 62)))
    assert(got == exp, s"got $got")
  }

  test("indexed path equals the scan path bit-for-bit and prunes to term buckets") {
    val big = (0L until 60L).map { i =>
      val extra = if (i % 3 == 0) Seq("cat") else if (i % 3 == 1) Seq("dog") else Seq.empty
      (i, Seq(s"w$i", s"u${i % 7}", s"v${i % 11}") ++ extra)
    }.toDF("doc_id", "toks")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      Retrieval.writeBm25Index(big, col("doc_id"), col("toks"), dir, buckets = 16)
      val scan = Retrieval.bm25TopK(big, col("doc_id"), col("toks"),
        Seq("cat", "dog", "absent"), k = 15).as[(Long, Double)].collect().toSeq
      val idx = Retrieval.bm25TopKIndexed(spark, dir,
        Seq("cat", "dog", "absent"), k = 15, buckets = 16)
      val got = idx.as[(Long, Double)].collect().toSeq
      assert(got == scan, s"indexed != scan:\n$got\n$scan")
      // pruning: the parquet scan must carry a partition filter on bucket
      val planStr = idx.queryExecution.executedPlan.toString
      assert(planStr.contains("PartitionFilters") &&
        planStr.contains("bucket"), s"no bucket pruning in:\n$planStr")
    } finally {
      import java.nio.file.{Files, Paths}
      val walk = Files.walk(Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("mmrRerank: diversity beats a redundant higher-relevance candidate") {
    import spark.implicits._
    // doc2 nearly duplicates doc1; doc3 is orthogonal with lower relevance
    val cands = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),
      (2L, 0.85, Seq(1.0, 0.01)),
      (3L, 0.5, Seq(0.0, 1.0))
    ).toDF("doc_id", "rel", "v")
    val out = Retrieval.mmrRerank(cands, col("doc_id"), col("rel"), col("v"),
        k = 3, lambda = 0.7)
      .orderBy("mmr_rank")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L), out.mkString(","))
    assert(math.abs(out(0)._3 - 0.63) < 1e-9)
    assert(math.abs(out(1)._3 - 0.35) < 1e-9)
    // doc2 penalized by its near-1 sim to doc1
    val sim12 = 1.0 / math.sqrt(1.0 + 0.01 * 0.01)
    val s9 = new java.math.BigDecimal(sim12)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(math.abs(out(2)._3 - (0.7 * 0.85 - 0.3 * s9)) < 1e-9)
  }

  test("mmrRerank: id tie-break, k > n, and the shortlist guard") {
    import spark.implicits._
    val ties = Seq(
      (7L, 0.5, Seq(1.0, 0.0)), (3L, 0.5, Seq(1.0, 0.0))
    ).toDF("doc_id", "rel", "v")
    val out = Retrieval.mmrRerank(ties, col("doc_id"), col("rel"), col("v"),
        k = 5, lambda = 1.0)
      .orderBy("mmr_rank").as[(Long, Long, Double)].collect()
    assert(out.length == 2)                      // k capped at n
    assert(out.map(_._2).toSeq == Seq(3L, 7L))   // smaller id first on ties
    intercept[IllegalArgumentException](
      Retrieval.mmrRerank(ties, col("doc_id"), col("rel"), col("v"),
        k = 1, lambda = 0.5, maxCandidates = 1))
  }

  test("mmrRerank: lambda=1 reduces to pure relevance ordering") {
    import spark.implicits._
    val cands = Seq(
      (1L, 0.2, Seq(1.0, 0.0)), (2L, 0.9, Seq(1.0, 0.0)),
      (3L, 0.5, Seq(1.0, 0.0))
    ).toDF("doc_id", "rel", "v")
    val out = Retrieval.mmrRerank(cands, col("doc_id"), col("rel"), col("v"),
        k = 3, lambda = 1.0)
      .orderBy("mmr_rank").as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 1L))
  }
}
