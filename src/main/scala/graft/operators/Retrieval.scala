package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — the "find me the documents about X"
  * query a curation team runs constantly (inspecting contamination hits,
  * pulling topical slices, eyeballing dedup clusters). Scoring is BM25
  * (Robertson–Spärck Jones family; the `(k1+1)` tf-saturation form and the
  * `ln(1 + (N-df+0.5)/(df+0.5))` non-negative idf are the public Lucene
  * convention).
  *
  * Two 100 TB shapes, picked by query pattern:
  *  - [[bm25TopK]] (ad-hoc): NO index — for a one-off query over a parquet
  *    corpus the winning plan is two scans and zero joins. Per-term tf
  *    comes from an array `filter` size (codegen'd projection — the token
  *    array never explodes), corpus stats (N, avgdl, per-term df) are ONE
  *    map-side-combined aggregate row broadcast back, and the top-k is a
  *    `TakeOrderedAndProject` (k rows per partition cross the wire, never
  *    the corpus). Query terms live in the plan as literals.
  *  - [[writeBm25Index]] + [[bm25TopKIndexed]] (repeated queries): build
  *    the postings artifacts once at ingest; each query then opens only
  *    its terms' bucket partitions — work proportional to the terms'
  *    document frequency, not the corpus.
  */
object Retrieval {

  /** The shared BM25 scoring expression over columns `__tf$i`, `__dl`,
    * `__n`, `__avgdl`, `__df$i` — ONE expression tree used by both the
    * scan and the indexed path, so their doubles agree bit-for-bit (the
    * left-to-right term sum is part of the contract; a reordered sum can
    * differ in the last ulp and flip a rounded 6-dp tie). */
  private def scoreExpr(nTerms: Int, k1: Double, b: Double): Column = {
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))
    (0 until nTerms).map { i =>
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      idf * col(s"__tf$i") * lit(k1 + 1.0) / (col(s"__tf$i") + norm)
    }.reduceLeft(_ + _)
  }

  /** Top-k documents by BM25 over `terms` (deduplicated, order-stable).
    * Docs containing none of the terms never surface. Scores are rounded
    * to 6 decimals BEFORE the cut and tie-broken by doc_id, so the k-th
    * place is deterministic across engines and runs. Output:
    * (doc_id, bm25). Requires a corpus with at least one token. */
  def bm25TopK(df: DataFrame, id: Column, toks: Column, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "need at least one query term")
    require(k > 0, "k must be positive")
    val tfCols = ts.indices.map(i => s"__tf$i")
    val withTf = df.select(
      (id.cast("long").as("doc_id") +:
        size(toks).cast("double").as("__dl") +:
        ts.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("double").as(tfCols(i))
        }): _*)
    val statCols =
      count(lit(1)).cast("double").as("__n") +:
        avg(col("__dl")).as("__avgdl") +:
        ts.indices.map(i =>
          sum(when(col(tfCols(i)) > 0, 1L).otherwise(0L)).cast("double")
            .as(s"__df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    withTf.crossJoin(broadcast(stats))
      .filter(greatest(lit(0.0) +: tfCols.map(col): _*) > 0)
      .select(col("doc_id"), round(scoreExpr(ts.size, k1, b), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Two-field BM25F-lite — BODY + ANCHOR TEXT, the classic web-corpus
    * ranking upgrade (what the rest of the web calls a page is stronger
    * retrieval evidence than the page's own words; aggregating inlink
    * anchors into a weighted field is the standard construction, and
    * [[graft.operators.LinkGraph.anchorCorpus]]'s bounded top-k output
    * is exactly the anchor side this consumes):
    *
    *  - per field f, tf is length-normalized FIRST:
    *    `tf_f / (1 - b + b·dl_f/avgdl_f)`, then field-weighted and
    *    SUMMED into one pseudo-frequency before a single saturation —
    *    the Robertson–Zaragoza simplified BM25F (per-field weights
    *    `wBody`/`wAnchor`, shared `b` and `k1`). With the anchor field
    *    absent the formula degenerates EXACTLY to [[bm25TopK]]'s
    *    classic BM25 (divide its tf and norm by B), which is why the
    *    returned `bm25_body` column is the comparable body-only score.
    *  - idf comes from the BODY corpus only: anchor df would let a
    *    mirror-phrased link farm depress a term's idf corpus-wide.
    *  - anchor tf/dl are weighted by inlink count (`anchorCnt`), so a
    *    phrase 1 000 pages use counts 1 000× — over the top-k corpus
    *    rows this stays bounded per target no matter the inlink skew.
    *
    * `anchors` rows are (anchorId → target doc, anchorText phrase,
    * anchorCnt inlink count). Scores round to 6 dp before the cut,
    * ties break by doc_id. Output: (doc_id, bm25f, bm25_body).
    *
    * 100 TB shape: one anchor-side aggregate (map-side combined, keyed
    * by target doc), one doc-keyed equi-join body⋈anchors, two
    * single-row stat frames broadcast — no window, nothing quadratic;
    * docs matching NO query term in either field never survive the
    * pre-cut filter. */
  def bm25fTopK(docs: DataFrame, id: Column, toks: Column,
                anchors: DataFrame, anchorId: Column, anchorText: Column,
                anchorCnt: Column, terms: Seq[String], k: Int,
                wBody: Double = 1.0, wAnchor: Double = 1.0,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "need at least one query term")
    require(k > 0, "k must be positive")
    val tfCols = ts.indices.map(i => s"__tf$i")
    val withTf = docs.select(
      (id.cast("long").as("doc_id") +:
        size(toks).cast("double").as("__dl") +:
        ts.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("double").as(tfCols(i))
        }): _*)
    // anchor field: per-row phrase tf × inlink count, then one
    // target-keyed sum (map-side combined)
    val anchorAgg = anchorFieldAgg(anchors, anchorId, anchorText,
      anchorCnt, ts)
    val bodyStatCols =
      count(lit(1)).cast("double").as("__n") +:
        avg(col("__dl")).as("__avgdl") +:
        ts.indices.map(i =>
          sum(when(col(tfCols(i)) > 0, 1L).otherwise(0L)).cast("double")
            .as(s"__df$i"))
    val bodyStats = withTf.agg(bodyStatCols.head, bodyStatCols.tail: _*)
    fuseAndCut(withTf, anchorAgg, bodyStats, ts.size, k,
      wBody, wAnchor, k1, b, joinType = "left")
  }

  /** The per-anchor-row field columns [[bm25fTopK]] and
    * [[bm25fTopKIndexed]] both aggregate: inlink-count-weighted phrase
    * length and per-term occurrences. */
  private def anchorFieldAgg(anchors: DataFrame, anchorId: Column,
                             anchorText: Column, anchorCnt: Column,
                             ts: Seq[String]): DataFrame = {
    val atfCols = ts.indices.map(i => s"__atf$i")
    val atoks = graft.functions.TextOps.tokens(anchorText)
    anchors.select(
      (anchorId.cast("long").as("doc_id") +:
        (anchorCnt.cast("double") * size(atoks).cast("double")).as("__dla") +:
        ts.zipWithIndex.map { case (t, i) =>
          (anchorCnt.cast("double") *
            size(filter(atoks, x => x === lit(t))).cast("double"))
            .as(atfCols(i))
        }): _*)
      .groupBy("doc_id")
      .agg(sum(col("__dla")).as("__dla"),
        ts.indices.map(i => sum(col(atfCols(i))).as(atfCols(i))): _*)
  }

  /** The shared BM25F tail: join body (`doc_id, __dl, __tf$i`) with the
    * anchor aggregate (`doc_id, __dla, __atf$i`), broadcast the stat
    * rows, score fused + body-only, cut. The expression tree is ONE
    * shape for the scan and indexed paths so their doubles agree
    * bit-for-bit (the [[scoreExpr]] convention). */
  private def fuseAndCut(body: DataFrame, anchorAgg: DataFrame,
                         bodyStats: DataFrame, nTerms: Int, k: Int,
                         wBody: Double, wAnchor: Double,
                         k1: Double, b: Double,
                         joinType: String): DataFrame =
    fuseScores(body, anchorAgg, bodyStats, nTerms, wBody, wAnchor,
        k1, b, joinType)
      .select(col("doc_id"),
        round(col("__rawf"), 6).as("bm25f"),
        round(col("__rawb"), 6).as("bm25_body"))
      .orderBy(col("bm25f").desc, col("doc_id").asc)
      .limit(k)

  /** The UN-CUT, UN-ROUNDED form of [[fuseAndCut]] — candidate rows
    * (doc_id, __rawf fused, __rawb body-only) for callers that fuse a
    * further signal before rounding and cutting
    * ([[blendStaticPrior]]). Same expression tree as the cut path, so
    * round(__rawf, 6) reproduces its `bm25f` bit-for-bit. */
  private def fuseScores(body: DataFrame, anchorAgg: DataFrame,
                         bodyStats: DataFrame, nTerms: Int,
                         wBody: Double, wAnchor: Double,
                         k1: Double, b: Double,
                         joinType: String): DataFrame = {
    val tfCols = (0 until nTerms).map(i => s"__tf$i")
    val atfCols = (0 until nTerms).map(i => s"__atf$i")
    val anchorStats = anchorAgg.filter(col("__dla") > 0)
      .agg(avg(col("__dla")).as("__avgdla"))
    val joined = body.join(anchorAgg, Seq("doc_id"), joinType)
      .na.fill(0.0, ("__dl" +: "__dla" +: (tfCols ++ atfCols)).toSeq)
      .crossJoin(broadcast(bodyStats))
      .crossJoin(broadcast(anchorStats))
    val bB = lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")
    val bA = lit(1.0 - b) + lit(b) * col("__dla") / col("__avgdla")
    def score(withAnchor: Boolean): Column =
      (0 until nTerms).map { i =>
        val idf = log(lit(1.0) +
          (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
        val tft = lit(wBody) * col(s"__tf$i") / bB +
          (if (withAnchor)
            when(col("__dla") > 0, lit(wAnchor) * col(s"__atf$i") / bA)
              .otherwise(lit(0.0))
          else lit(0.0))
        idf * tft * lit(k1 + 1.0) / (tft + lit(k1))
      }.reduceLeft(_ + _)
    joined
      .filter(greatest(lit(0.0) +: (tfCols ++ atfCols).map(col): _*) > 0)
      .select(col("doc_id"), score(withAnchor = true).as("__rawf"),
        score(withAnchor = false).as("__rawb"))
  }

  /** BM25F served from PERSISTED artifacts — the repeated-query form of
    * [[bm25fTopK]] the way [[bm25TopKIndexed]] is of [[bm25TopK]]: the
    * body field comes from the inverted index at `dir` (term-bucket
    * partition pruning, per-doc tf/dl off the postings, corpus n/avgdl
    * off the stats artifact, df from the pruned postings themselves),
    * the anchor field from `anchors` rows — e.g.
    * [[graft.operators.LinkGraph.servedAnchorCorpus]], the incremental
    * link artifact, completing the all-artifacts serving triangle
    * (postings + link graph; no corpus scan anywhere).
    *
    * Candidates are the UNION of body matches and anchor matches (full
    * outer join): a page nobody's body mentions but everybody's links
    * name — the page the anchor field exists for — still surfaces,
    * with its body contribution exactly 0 (its dl is irrelevant: a
    * zero tf zeroes the term regardless of length normalization).
    * CALLER CONTRACT: `anchors` must cover corpus documents only (the
    * scan path scores only corpus docs; semi-join your anchor side to
    * the corpus if targets may point outside it). */
  def bm25fTopKIndexed(spark: SparkSession, dir: String,
                       anchors: DataFrame, anchorId: Column,
                       anchorText: Column, anchorCnt: Column,
                       terms: Seq[String], k: Int,
                       wBody: Double = 1.0, wAnchor: Double = 1.0,
                       k1: Double = 1.2, b: Double = 0.75,
                       buckets: Int = 64): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "need at least one query term")
    require(k > 0, "k must be positive")
    val (perDoc, statFrame) = indexedBodyFrames(spark, dir, ts, buckets)
    fuseAndCut(perDoc,
      anchorFieldAgg(anchors, anchorId, anchorText, anchorCnt, ts),
      statFrame, ts.size, k, wBody, wAnchor, k1, b,
      joinType = "full_outer")
  }

  /** The indexed body field: per-candidate tf/dl off the pruned
    * postings plus the single stat row (n, avgdl, per-term df) —
    * shared by [[bm25fTopKIndexed]] and [[bm25fScoresIndexed]]. */
  private def indexedBodyFrames(spark: SparkSession, dir: String,
                                ts: Seq[String], buckets: Int)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val tsBuckets = ts.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(buckets.toLong))).as[Long]
      .collect().distinct.toSeq
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(tsBuckets.map(_.toInt): _*))
      .filter(col("term").isin(ts: _*))
    val stats = readStats(spark, dir)
    // coalesce: a term in NO document body must have df 0 (the scan
    // path's value — max idf), not NULL. With `post` empty the global
    // aggregate still emits one row, and a null df would null every
    // score of the anchor-only candidates the full-outer union surfaces.
    val dfAggs = ts.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("term") === lit(t), 1L).otherwise(0L)), lit(0L))
        .cast("double").as(s"__df$i")
    }
    val dfs = post.agg(dfAggs.head, dfAggs.tail: _*)
    val tfAggs =
      max(col("dl")).as("__dl") +:
        ts.zipWithIndex.map { case (t, i) =>
          coalesce(sum(when(col("term") === lit(t), col("tf"))), lit(0.0))
            .as(s"__tf$i")
        }
    val perDoc = post.groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)
    (perDoc, stats.crossJoin(dfs))
  }

  /** [[bm25fTopKIndexed]] WITHOUT the round/cut tail: every candidate
    * (body or anchor match) with its raw fused and body-only scores —
    * (doc_id, bm25f_raw, bm25_body_raw). The frame downstream fusion
    * stages consume ([[blendStaticPrior]]): rounding before blending
    * would bake the cross-engine fence into the wrong place, and
    * cutting before blending would drop docs a strong prior should
    * promote. Same candidate set and expression tree as the cut path —
    * round(bm25f_raw, 6) IS its `bm25f`. Caller contract on `anchors`
    * is [[bm25fTopKIndexed]]'s (corpus-covered targets only). */
  def bm25fScoresIndexed(spark: SparkSession, dir: String,
                         anchors: DataFrame, anchorId: Column,
                         anchorText: Column, anchorCnt: Column,
                         terms: Seq[String],
                         wBody: Double = 1.0, wAnchor: Double = 1.0,
                         k1: Double = 1.2, b: Double = 0.75,
                         buckets: Int = 64): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "need at least one query term")
    val (perDoc, statFrame) = indexedBodyFrames(spark, dir, ts, buckets)
    fuseScores(perDoc,
      anchorFieldAgg(anchors, anchorId, anchorText, anchorCnt, ts),
      statFrame, ts.size, wBody, wAnchor, k1, b,
      joinType = "full_outer")
      .select(col("doc_id"), col("__rawf").as("bm25f_raw"),
        col("__rawb").as("bm25_body_raw"))
  }

  /** Static-rank blending — fuse a QUERY-INDEPENDENT document prior
    * (link centrality, domain trust, freshness) into a per-query
    * relevance score, the classic web-ranking composition (a BM25-family
    * text score plus a PageRank-family static score; see e.g. the LETOR
    * feature families): `blended = round6(raw + lambda·prior)`.
    *
    * `scored` is an UN-CUT candidate frame ([[bm25fScoresIndexed]]) —
    * blending after a top-k cut would silently drop documents a strong
    * prior should promote into the final page. `domainOf` maps each
    * candidate row to the key of `prior` (a hosting-domain expression or
    * joined metadata column); candidates whose domain has no prior row
    * blend with 0.0. Output: (doc_id, domain, prior, bm25f, blended) cut
    * to top `k` by (blended desc, doc_id), scores rounded to 6 dp AFTER
    * the blend so both engines fence the same final double.
    *
    * 100 TB shape: one broadcast hash join (the prior is domain-sized —
    * graph nodes, not corpus docs) onto the candidate frame, then a
    * TakeOrdered cut — no corpus scan, no extra shuffle. */
  def blendStaticPrior(scored: DataFrame, raw: Column, domainOf: Column,
                       prior: DataFrame, priorDomain: Column,
                       priorScore: Column, lambda: Double,
                       k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // collapse duplicate prior rows per domain (max wins, deterministic)
    // BEFORE the join: an un-aggregated prior frame (per-batch partials)
    // would otherwise fan every candidate of that domain out through the
    // left join and put duplicate doc_ids inside the top-k page — the
    // Frontier.schedule delay-rows precedent
    val p = prior.select(priorDomain.cast("string").as("__pd"),
      priorScore.cast("double").as("__ps"))
      .groupBy("__pd").agg(max(col("__ps")).as("__ps"))
    scored
      .withColumn("__domain", domainOf)
      .withColumn("__raw", raw.cast("double"))
      .join(broadcast(p), col("__domain") === col("__pd"), "left")
      .withColumn("__prior", coalesce(col("__ps"), lit(0.0)))
      .select(col("doc_id"), col("__domain").as("domain"),
        col("__prior").as("prior"),
        round(col("__raw"), 6).as("bm25f"),
        round(col("__raw") + lit(lambda) * col("__prior"), 6).as("blended"))
      .orderBy(col("blended").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval serving
    * pattern (RAG: fuse a keyword leg and an embedding leg over the same
    * corpus): each leg contributes `1/(c + rank)` per document, summed.
    * `legs` are ALREADY-CUT top-k frames (doc_id, score) — at most k rows
    * each by construction — with scores pre-rounded so rank ties resolve
    * identically in any engine. Ranks come from a window PARTITIONED BY
    * leg (bounded: |legs| partitions × k rows — never corpus-sized), ties
    * broken by doc_id; the fused cut keeps the top `k` by (rrf desc,
    * doc_id). Output: (doc_id, rank_<leg>... with -1 for a leg that
    * didn't surface the doc, rrf at 6 dp). Pure arithmetic over the leg
    * frames — the production legs can be the persisted-index servers
    * ([[bm25TopKIndexed]], [[Ann.ivfPqTopKIndexed]]) with zero change
    * here. */
  def rrfFuse(legs: Seq[(String, DataFrame)], k: Int,
              c: Double = 60.0): DataFrame = {
    require(legs.nonEmpty, "need at least one leg")
    require(k > 0, "k must be positive")
    val tagged = legs.map { case (name, df) =>
      df.select(lit(name).as("leg"), col("doc_id"),
        col("score").cast("double").as("score"))
    }.reduce(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("leg").orderBy(desc("score"), col("doc_id"))
    val ranked = tagged
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
    val rankCols = legs.map { case (name, _) =>
      coalesce(max(when(col("leg") === name, col("rank"))), lit(-1L))
        .as(s"rank_$name")
    }
    ranked.groupBy("doc_id")
      .agg(rankCols.head, rankCols.tail :+
        round(sum(lit(1.0) / (lit(c) + col("rank"))), 6).as("rrf"): _*)
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(k)
  }

  /** Persist the inverted-index artifacts the REPEATED-query path serves
    * from (the scan path above wins for one-off queries; a corpus that
    * answers keyword queries all day builds this once at ingest):
    *
    *  - `dir/postings`: (term, doc_id, tf, dl) — one row per distinct
    *    (term, doc) pair, parquet-partitioned by `bucket =
    *    pmod(xxhash64(term), buckets)` so a query's terms prune to at most
    *    |terms| partitions and the rest of the corpus is never opened.
    *    Doc length rides the posting (the Lucene norms convention) so
    *    query time joins nothing doc-sized.
    *  - `dir/stats`: one row (n docs, avgdl) — corpus constants computed
    *    over ALL docs at build time, identical to the scan path's.
    *
    * Build is explode → groupBy — both shuffles are on (term, doc) keys,
    * partial-aggregated map-side; nothing quadratic, nothing driver-side. */
  def writeBm25Index(df: DataFrame, id: Column, toks: Column, dir: String,
                     buckets: Int = 64): Unit = {
    require(buckets >= 1, "need at least one bucket")
    val docs = df.select(id.cast("long").as("doc_id"), toks.as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("double"))
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
    postings.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    docs.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Incremental postings maintenance — the continuous-ingest form of
    * [[writeBm25Index]]: each document batch appends its postings under a
    * (batch_id, bucket) partition and its corpus-stats PARTIAL (doc count,
    * total length) under dir/stats_parts. Dynamic partition overwrite makes
    * a retried batch replace its own partitions (the DocStreams idempotence
    * device), and the serve path sums the partials — so after any sequence
    * of appends, [[bm25TopKIndexed]] answers over the union exactly as if
    * the index had been built in one shot. Batches must not re-ship a
    * doc_id (the ingest contract; run the dedup admission first). */
  def appendBm25Postings(df: DataFrame, id: Column, toks: Column, dir: String,
                         batchId: Long, buckets: Int = 64): Unit = {
    require(buckets >= 1, "need at least one bucket")
    requireNoBm25CrashDebris(df.sparkSession, dir)
    // A replay of a batch that compaction already folded into the base
    // partition must be a no-op — its rows are in batch_id=-1 now, so the
    // prefix delete below would remove nothing and the write would
    // double-count. Batch ids are monotone (ingest contract), so the fold
    // watermark decides.
    if (batchId <= foldedWatermark(df.sparkSession, dir)) return
    // Retry safety: drop this batch's partitions FIRST. Dynamic partition
    // overwrite alone only replaces partitions present in the retry's
    // output — if the retry's input lost a bucket (upstream change between
    // attempts), the first attempt's partition for that bucket would
    // survive and double-count. Deleting the batch_id prefix makes a retry
    // idempotent regardless of what the retry emits.
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    for (sub <- Seq("postings", "stats_parts")) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub/batch_id=$batchId")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val docs = df.select(id.cast("long").as("doc_id"), toks.as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("double"))
    docs.select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "bucket").parquet(s"$dir/postings")
    docs.agg(count(lit(1)).cast("double").as("n"), sum("dl").as("sum_dl"))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/stats_parts")
  }

  private def foldManifestPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/compacted_watermark")

  /** Refuse an index left in [[compactBm25Postings]]'s between-renames
    * crash window (the [[ArtifactFold.requireNoCrashDebris]] posture
    * for this index's own `<sub>_old` naming): `<sub>_old` present with
    * no live `<sub>` means the old dir holds the ONLY copy — an append
    * would rebuild next to orphaned history, and a serve would read an
    * empty index as if the corpus were empty. Recovery is one manual
    * rename back. */
  private def requireNoBm25CrashDebris(spark: SparkSession,
                                       dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    for (sub <- Seq("postings", "stats_parts")) {
      val live = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val old = new org.apache.hadoop.fs.Path(s"$dir/${sub}_old")
      val fs = live.getFileSystem(conf)
      require(!fs.exists(old) || fs.exists(live),
        s"fold crash debris: $old exists without $live — rename it back " +
          "to recover before appending, folding, or serving")
    }
  }

  /** Highest batch id folded into the base partition by
    * [[compactBm25Postings]] (Long.MinValue if never compacted). */
  private[operators] def foldedWatermark(
      spark: SparkSession, dir: String): Long = {
    val p = foldManifestPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Fold the accumulated per-batch postings partitions into ONE partition
    * per bucket — the small-files maintenance a daily-ingest index needs
    * (k batches × buckets files otherwise accrete forever; bucket pruning
    * then opens k files per bucket instead of one). The folded rows land
    * under the reserved base partition `batch_id=-1` (bucket-partitioned,
    * term-sorted within each file for row-group pruning), the stats
    * partials collapse to one base partial, and a watermark records the
    * highest folded batch id: a replayed already-folded batch becomes a
    * NO-OP in [[appendBm25Postings]] instead of double-counting (batch ids
    * must be monotone — the daily-ingest contract). Serve-path layout is
    * unchanged ([[bm25TopKIndexed]] reads all batch partitions and prunes
    * on bucket), and post-compaction appends keep working. Run it in the
    * ingest maintenance window — the swap is not transactional against
    * concurrent readers. */
  def compactBm25Postings(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    requireNoBm25CrashDebris(spark, dir)
    val postings = new org.apache.hadoop.fs.Path(s"$dir/postings")
    val statsParts = new org.apache.hadoop.fs.Path(s"$dir/stats_parts")
    val fs = postings.getFileSystem(conf)
    if (!fs.exists(statsParts)) return // one-shot index: already compact
    val post = spark.read.parquet(postings.toString)
    // ONE driver row; merged with the previous watermark so compacting an
    // already-fully-compacted index (max batch_id = -1) can't regress it
    val maxBatch = math.max(
      post.agg(max(col("batch_id").cast("long"))).head().getLong(0),
      foldedWatermark(spark, dir))
    post.select(col("term"), col("doc_id"), col("dl"), col("tf"),
        col("bucket"))
      .repartition(col("bucket")) // one task → one file per bucket value
      .sortWithinPartitions("term", "doc_id")
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id", "bucket")
      .parquet(s"$dir/postings_tmp")
    spark.read.parquet(statsParts.toString)
      .agg(sum("n").as("n"), sum("sum_dl").as("sum_dl"))
      .withColumn("batch_id", lit(-1L))
      .coalesce(1).write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$dir/stats_parts_tmp")
    // Watermark BEFORE the swap: if we crashed between the swap and a
    // trailing watermark write, a replayed already-folded batch would pass
    // the watermark check, find nothing under its batch_id (folded into
    // batch_id=-1), and re-write its rows — double-counting. Written
    // first, a crash before the swap merely blocks replays of batches
    // whose rows are already fully present — conservative, not wrong.
    val out = fs.create(foldManifestPath(dir), true)
    try out.write(maxBatch.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // Staged swap: two metadata renames instead of recursive-delete-then-
    // rename, so the window with no live dir is two namenode ops, and a
    // crash inside it leaves the previous data recoverable under _old.
    for (sub <- Seq("postings", "stats_parts")) {
      val live = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/${sub}_tmp")
      val old = new org.apache.hadoop.fs.Path(s"$dir/${sub}_old")
      if (fs.exists(old)) fs.delete(old, true) // stale from a prior crash
      require(fs.rename(live, old), s"rename failed for $live")
      require(fs.rename(tmp, live), s"rename failed for $tmp")
      fs.delete(old, true)
    }
  }

  /** Corpus stats for an index dir: the one-shot artifact when present,
    * else the sum of the appended partials. */
  private def readStats(spark: SparkSession, dir: String): DataFrame = {
    // the serve choke point (every indexed bm25/bm25f path reads stats):
    // refuse the fold's crash window instead of scoring over a
    // half-vanished index
    requireNoBm25CrashDebris(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/stats")))
      spark.read.parquet(s"$dir/stats")
        .select(col("n").as("__n"), col("avgdl").as("__avgdl"))
    else
      spark.read.parquet(s"$dir/stats_parts")
        .agg(sum("n").as("__n"), sum("sum_dl").as("__sdl"))
        .select(col("__n"), (col("__sdl") / col("__n")).as("__avgdl"))
  }

  /** BM25 top-k served from [[writeBm25Index]] artifacts — bit-identical
    * to [[bm25TopK]] on the same corpus (shared scoring expression; the
    * per-doc tf pivot keeps the term sum in query order). The plan touches
    * only the query terms' bucket partitions: partition pruning on the
    * literal bucket list, then a term filter inside them; df comes from
    * counting those postings, candidates are the union of the terms'
    * postings lists (output-sized), and the cut is a
    * TakeOrderedAndProject. */
  def bm25TopKIndexed(spark: SparkSession, dir: String, terms: Seq[String],
                      k: Int, k1: Double = 1.2, b: Double = 0.75,
                      buckets: Int = 64): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "need at least one query term")
    require(k > 0, "k must be positive")
    import spark.implicits._
    // the terms' buckets, via the same codegen'd xxhash64 (local relation —
    // no cluster job); literals in the plan drive partition pruning
    val tsBuckets = ts.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(buckets.toLong))).as[Long]
      .collect().distinct.toSeq
    // isin with Int literals: the directory-inferred partition column reads
    // back as IntegerType, and Long literals would put a cast on the
    // ATTRIBUTE side of the comparison — defeating the partition pruning
    // this path exists for. Bucket values are < `buckets` ≤ Int range.
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(tsBuckets.map(_.toInt): _*))
      .filter(col("term").isin(ts: _*))
    val stats = readStats(spark, dir)
    // coalesce df to 0 on empty postings (the bm25fTopKIndexed fix —
    // dead here because no candidates survive either, kept identical so
    // the two indexed paths share one aggregate shape)
    val dfAggs = ts.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("term") === lit(t), 1L).otherwise(0L)), lit(0L))
        .cast("double").as(s"__df$i")
    }
    val dfs = post.agg(dfAggs.head, dfAggs.tail: _*)
    val tfAggs =
      max(col("dl")).as("__dl") +:
        ts.zipWithIndex.map { case (t, i) =>
          coalesce(sum(when(col("term") === lit(t), col("tf"))), lit(0.0))
            .as(s"__tf$i")
        }
    val perDoc = post.groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)
    perDoc
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfs))
      .select(col("doc_id"), round(scoreExpr(ts.size, k1, b), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
    * public) — the diversity pass a RAG serving stack runs AFTER its
    * retriever: greedily pick the candidate maximizing
    * `λ·rel − (1−λ)·max_{s∈selected} cos(d, s)`, so near-duplicate hits
    * don't crowd the context window.
    *
    * The candidate frame is the BOUNDED output of an upstream top-N
    * (ANN/BM25/RRF — hundreds of rows), so the loop runs on the driver
    * over a collected shortlist (`maxCandidates` guards the contract);
    * the distributed work already happened in the retriever. Determinism:
    * `rel` should arrive pre-rounded (the retriever convention), pairwise
    * cosines are rounded to 9 (exact-binary half-up — matches SQL
    * `round` away from boundaries), ties break to the smaller id, and
    * the left-fold cosine matches [[graft.functions.VectorOps.cosine]]
    * term order — so a SQL replay reproduces the selection exactly
    * (q114). First pick: empty-set penalty term is 0.
    * Output: (mmr_rank 1-based, doc_id, mmr_score). */
  def mmrRerank(candidates: DataFrame, id: Column, rel: Column, vec: Column,
                k: Int, lambda: Double, maxCandidates: Int = 4096): DataFrame = {
    require(k >= 1, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(id.cast("long").as("doc_id"), rel.cast("double").as("rel"),
        vec.cast("array<double>").as("v"))
      .orderBy("doc_id") // ascending ids = the tie-break iteration order
      .collect()
    require(rows.length <= maxCandidates,
      s"mmrRerank got ${rows.length} candidates (> $maxCandidates): rerank a " +
        "top-N shortlist, not a corpus")
    val n = rows.length
    val ids = rows.map(_.getLong(0))
    val rels = rows.map(_.getDouble(1))
    val vs = rows.map(_.getSeq[Double](2).toArray)

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (math.sqrt(na) * math.sqrt(nb) > 0) dot / (math.sqrt(na) * math.sqrt(nb))
      else 0.0
    }
    def round9(x: Double): Double =
      new java.math.BigDecimal(x).setScale(9, java.math.RoundingMode.HALF_UP)
        .doubleValue()

    val mu = 1.0 - lambda
    val picked = new Array[Boolean](n)
    // true max over the selected set (cosines can be negative); the
    // empty-set penalty is explicitly zero on the first pick
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var r = 1
    while (r <= math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val score = lambda * rels(i) - mu * (if (r == 1) 0.0 else maxSim(i))
          if (score > bestScore) { bestScore = score; best = i } // first max = smallest id
        }
        i += 1
      }
      picked(best) = true
      out += ((r.toLong, ids(best), bestScore))
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val s9 = round9(cos(vs(i), vs(best)))
          if (s9 > maxSim(i)) maxSim(i) = s9
        }
        i += 1
      }
      r += 1
    }
    out.toSeq.toDF("mmr_rank", "doc_id", "mmr_score")
  }
}
