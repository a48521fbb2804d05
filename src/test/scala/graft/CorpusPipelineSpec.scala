package graft

import graft.functions.TextOps
import graft.operators.{CorpusPipeline, Dedup, Selection}
import org.apache.spark.sql.functions._

/** Composite training-data pipeline over the documents fixture: quality
  * filter → exact dedup → language split → near-dup candidate pruning —
  * the end-to-end shape the extended operators exist for. */
class CorpusPipelineSpec extends SparkSpec {

  test("quality -> dedup -> langid -> near-dup pipeline composes lazily and sanely") {
    val docs = Tables.documents(spark, sf001)
    val n0 = docs.count()

    // stage 1: quality floor
    val scored = docs.withColumn("q", TextOps.qualityScore(col("text")))
    val kept = scored.filter(col("q") >= 0.3)
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // stage 2: exact dedup on content fingerprint (fixture has none — count
    // must be preserved)
    val grouped = Dedup.exactByContent(kept, col("doc_id"), col("text"))
    assert(grouped.agg(sum("dups")).head().getLong(0) == n1)
    val uniques = kept.join(
      grouped.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    assert(uniques.count() == grouped.count())

    // stage 3: language distribution covers the corpus
    val langDist = uniques
      .select(TextOps.tokens(lower(col("text"))).as("__toks"))
      .select(TextOps.langIdFromTokens(col("__toks")).as("lang"))
      .groupBy("lang").count()
    assert(langDist.agg(sum("count")).head().getLong(0) == uniques.count())

    // stage 4: near-dup pairs among the kept docs (planted dups at sf0.001
    // share long prefixes -> minhash finds a nonzero, bounded candidate set)
    val pairs = Dedup.minhashDedupPairs(uniques, col("doc_id"), col("text"),
      threshold = 0.4)
    val np = pairs.count()
    assert(np < n1, s"near-dup pairs ($np) should be sparse vs corpus ($n1)")

    // whole-row dedup idempotence over the final set
    assert(Selection.dedup(uniques).count() == uniques.count())
  }

  test("CorpusPipeline.curate applies every gate on planted documents") {
    import spark.implicits._
    import graft.operators.CorpusPipeline
    // 2-stopword prefix: enough for stop_ok, but SHORTER than a 5-shingle
    // so distinct-seed docs share no complete word-5-shingle with the
    // benchmark (a 5-stopword prefix would decontaminate every doc).
    val stop = "the of "
    def longDoc(seed: String): String =
      stop + Seq.tabulate(60)(i => s"$seed$i").mkString(" ")
    val good = longDoc("alpha")
    val nearDupOfGood = good + " tail"         // minhash near-dup of `good`
    val exactDupOfGood = good                  // exact dup of `good`
    val tooShort = stop + "tiny doc"           // fails word-count rule
    val repetitious = stop +                   // top-word fraction ~0.97
      Seq.fill(60)("spam").mkString(" ")
    val benchLeak = longDoc("bench")           // shares 5-shingles w/ benchmark
    val docs = Seq(
      (0L, good), (1L, exactDupOfGood), (2L, nearDupOfGood),
      (3L, tooShort), (4L, repetitious), (5L, benchLeak),
      (6L, longDoc("clean"))
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, longDoc("bench"))).toDF("doc_id", "text")

    val curated = CorpusPipeline.curate(docs, col("doc_id"), col("text"),
      benchmark = Some(benchmark))
    val ids = curated.select("doc_id").as[Long].collect().toSet
    // 0 survives (keeper of {0,1,2}); 3 rule-gated; 4 repetition-gated;
    // 5 decontaminated; 6 clean
    assert(ids == Set(0L, 6L), s"curated ids: $ids")
    // schema preserved
    assert(curated.columns.toSeq == Seq("doc_id", "text"))
  }

  test("curateAudit blames each planted doc's FIRST failing gate and agrees with curate") {
    import spark.implicits._
    import graft.operators.CorpusPipeline
    val stop = "the of "
    def longDoc(seed: String): String =
      stop + Seq.tabulate(60)(i => s"$seed$i").mkString(" ")
    val good = longDoc("alpha")
    val docs = Seq(
      (0L, good), (1L, good), (2L, good + " tail"),
      (3L, stop + "tiny doc"), (4L, stop + Seq.fill(60)("spam").mkString(" ")),
      (5L, longDoc("bench")), (6L, longDoc("clean"))
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, longDoc("bench"))).toDF("doc_id", "text")
    val audit = CorpusPipeline.curateAudit(docs, col("doc_id"), col("text"),
        benchmark = Some(benchmark))
      .orderBy("doc_id")
      .select("doc_id", "reason", "kept", "rep_pass")
      .as[(Long, String, Long, Long)].collect().toSeq
    val reasons = audit.map(r => r._1 -> r._2).toMap
    assert(reasons == Map(0L -> "kept", 1L -> "exact_dup", 2L -> "near_dup",
      3L -> "rules", 4L -> "repetition", 5L -> "contaminated",
      6L -> "kept"), s"unexpected blame: $reasons")
    // unreached gates report -1, not failure (doc 3 fails RULES)
    assert(audit.find(_._1 == 3L).get._4 == -1L, "doc 3 never reached repetition")
    // audit.kept == curate's survivor set
    val keptIds = audit.filter(_._3 == 1L).map(_._1).toSet
    val curated = CorpusPipeline.curate(docs, col("doc_id"), col("text"),
      benchmark = Some(benchmark)).select("doc_id").as[Long].collect().toSet
    assert(keptIds == curated, s"audit kept $keptIds != curate $curated")
  }

  test("toDataloader chains curate -> mixture -> packing into one DAG") {
    import spark.implicits._
    val stop = "the of "
    def longDoc(seed: String): String =
      stop + Seq.tabulate(60)(i => s"$seed$i").mkString(" ")
    // 20 distinct clean docs across two sources, plus one rule-gated runt
    val docs = ((0L until 20L).map(i =>
        (i, longDoc(s"d$i"), if (i % 2 == 0) "wiki" else "web")) :+
        (99L, stop + "tiny", "web"))
      .toSeq.toDF("doc_id", "text", "source")
    val packed = CorpusPipeline.toDataloader(docs, col("doc_id"), col("text"),
      sourceWeights = Map("wiki" -> 2.0), defaultWeight = 1.0,
      source = col("source"), tokenBudget = 100L)
    val rows = packed.select("doc_id", "epoch", "n_tok", "first_bin",
      "last_bin", "bin_off").collect()
    // the runt was curated out; wiki docs appear exactly twice (w=2.0 is
    // deterministic), web docs exactly once
    val byDoc = rows.groupBy(_.getLong(0)).map { case (d, g) => d -> g.length }
    assert(!byDoc.contains(99L), "rule-gated doc leaked into the dataloader")
    byDoc.foreach { case (d, n) =>
      assert(n == (if (d % 2 == 0) 2 else 1), s"doc $d drawn $n times")
    }
    // packing invariants: every doc is 62 tokens, budget 100 -> each window
    // holds at most 2 (possibly split) docs and offsets stay < budget
    assert(rows.forall(_.getLong(2) == 62L))
    assert(rows.forall(r => r.getLong(5) >= 0L && r.getLong(5) < 100L))
    // (epoch, doc_id) layout: every epoch-0 row precedes every epoch-1 row
    // in the stream, so a doc's two copies never share a training window
    val spans = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(3), r.getLong(4))).toMap
    assert(spans.size == rows.length)
    val maxE0End = rows.filter(_.getLong(1) == 0L).map(_.getLong(4)).max
    rows.filter(_.getLong(1) == 1L).foreach { r =>
      val d = r.getLong(0)
      assert(spans((d, 1L))._1 > spans((d, 0L))._2,
        s"doc $d: repeat epoch shares a window with its first copy")
    }
    assert(rows.filter(_.getLong(1) == 1L).map(_.getLong(3)).min >=
      maxE0End - 1, "epoch-1 rows must lay out after the epoch-0 block")
    // total stream length = sum of tokens; last window index matches
    val total = rows.map(_.getLong(2)).sum
    assert(rows.map(_.getLong(4)).max == (total - 1) / 100L)
  }
}
