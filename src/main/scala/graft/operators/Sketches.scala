package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A rank-sketch sample row: the row-key hash coin and the carried value. */
case class RankHV(h: Long, v: Double)

/** Bounded BOTTOM-k aggregate over (h, v) pairs — [[TopKAggregator]]'s
  * mirror for the rank-sketch order: keeps the k smallest by (h asc,
  * v asc), evicting the largest at capacity, so a per-group rank sample
  * does map-side partial bottom-k and shuffles at most k rows per
  * (partition, group). Duplicates are kept (each row is its own coin);
  * the (h, v) tie order makes the kept multiset — and therefore every
  * served quantile — deterministic and SQL-replayable
  * (`ORDER BY h, v LIMIT k` per group). */
class BottomKRankAggregator(k: Int)
    extends Aggregator[RankHV, Seq[RankHV], Seq[RankHV]] {
  require(k > 0)
  def zero: Seq[RankHV] = Vector.empty

  // descending (h, v): the head is the LARGEST kept pair — the element
  // bottom-k preference evicts next
  private def greaterThan(a: RankHV, b: RankHV): Boolean =
    a.h > b.h || (a.h == b.h && a.v > b.v)

  private def insert(buf: Seq[RankHV], s: RankHV): Seq[RankHV] = {
    val n = buf.length
    if (n >= k && !greaterThan(buf.head, s)) buf
    else {
      val drop = if (n >= k) 1 else 0 // at capacity: evict the head (largest)
      val arr = new Array[RankHV](n - drop + 1)
      var lo = drop
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (greaterThan(buf(mid), s)) lo = mid + 1 else hi = mid
      }
      var i = drop
      while (i < lo) { arr(i - drop) = buf(i); i += 1 }
      arr(lo - drop) = s
      while (lo < n) { arr(lo - drop + 1) = buf(lo); lo += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
    }
  }

  def reduce(buf: Seq[RankHV], in: RankHV): Seq[RankHV] = insert(buf, in)
  def merge(a: Seq[RankHV], b: Seq[RankHV]): Seq[RankHV] = b.foldLeft(a)(insert)
  def finish(buf: Seq[RankHV]): Seq[RankHV] = buf.reverse // ascending (h, v)
  def bufferEncoder: Encoder[Seq[RankHV]] = ExpressionEncoder[Seq[RankHV]]()
  def outputEncoder: Encoder[Seq[RankHV]] = ExpressionEncoder[Seq[RankHV]]()
}

/** Persisted MERGEABLE cardinality sketches — the incremental twin of the
  * exact/approx distinct profiling (q21/q48): each ingest batch writes one
  * tiny HLL sketch row per tracked column (Spark's built-in Apache
  * DataSketches HllSketch aggregate — order-independent, register-max
  * mergeable), and "how many distinct users/tokens/keys so far?" is
  * answered by unioning KB-sized sketch rows instead of re-scanning the
  * accumulated corpus.
  *
  * 100 TB shape: the per-batch cost is one scan with map-side partial
  * sketches and a 2^lgK-byte-per-column final row; the serve cost is
  * reading (batches × columns) KB rows — constant in corpus size.
  * Register-max merging is associative and the union serve path uses the
  * composite estimator over that order-independent state, so ANY batching
  * of the same stream unions to bit-identical estimates (q111 gates
  * exactly that split-invariance). A direct single-pass build is NOT an
  * equality anchor: DataSketches' primary HIP estimator is
  * insertion-order-sensitive, so its estimate moves with plan/partition
  * order (observed 1487 vs 1495 on identical data).
  *
  * Write layout mirrors [[Retrieval.appendBm25Postings]]: one
  * `batch_id=N` partition per ingest batch, dynamic partition overwrite
  * so a retried batch replaces itself (same determinism contract), plus
  * the full postings hardening — a retried batch's partition is DELETED
  * before the rewrite (dynamic overwrite alone misses stale partitions
  * when the retry's output is empty), and per-family `compact*Sketches`
  * folds the accumulated batches into the reserved base partition
  * `batch_id=-1` with a fold watermark making replays of folded batches
  * no-ops. Without compaction, file counts grow one per batch forever —
  * the small-files accretion `compactBm25Postings` fixed for postings.
  */
object Sketches {

  // Fold/watermark/retry plumbing lives in [[ArtifactFold]] (shared with
  // the streaming admission histories); sketches fold to ONE file — the
  // folded frames are ≤columns / ≤depth×width / ≤bins rows by construction.
  private def foldedWatermark(spark: SparkSession, dir: String): Long =
    ArtifactFold.foldedWatermark(spark, dir)
  private def deleteBatchPartition(spark: SparkSession, dir: String,
                                   batchId: Long): Unit =
    ArtifactFold.deleteBatchPartition(spark, dir, batchId)
  private def swapInFolded(spark: SparkSession, dir: String,
                           folded: DataFrame): Unit =
    ArtifactFold.swapInFolded(spark, dir, folded, targetFiles = 1)
  private def exists(spark: SparkSession, dir: String): Boolean =
    ArtifactFold.exists(spark, dir)

  /** Append one HLL sketch row per column for this batch.
    * Rows: (batch_id, column, n_rows, n_batches=1, sketch) — `n_batches`
    * rides in-row (summed on serve) so folding batches into the base
    * partition preserves the served batch count exactly. */
  def appendCardinalitySketches(df: DataFrame, cols: Seq[String], dir: String,
                                batchId: Long, lgK: Int = 12): Unit = {
    require(cols.nonEmpty, "need at least one column")
    require(lgK >= 4 && lgK <= 21, "lgK must be in 4..21 (DataSketches bounds)")
    val spark = df.sparkSession
    // a replay of a batch compaction already folded into batch_id=-1 must
    // be a no-op — its rows live in the base partition now (batch ids are
    // monotone, the ingest contract)
    if (batchId <= foldedWatermark(spark, dir)) return
    deleteBatchPartition(spark, dir, batchId)
    val aggs = count(lit(1)).as("__n") +:
      cols.map(c => hll_sketch_agg(col(c).cast("string"), lit(lgK)).as(s"__s_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val unpivoted = one.select(lit(batchId).as("batch_id"),
      explode(array(cols.map(c =>
        struct(lit(c).as("column"), col("__n").as("n_rows"),
          lit(1L).as("n_batches"), col(s"__s_$c").as("sketch"))): _*)).as("e"))
      .select(col("batch_id"), col("e.column"), col("e.n_rows"),
        col("e.n_batches"), col("e.sketch"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try unpivoted.coalesce(1).write.mode("overwrite")
      .partitionBy("batch_id").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Union the accumulated batch sketches → one estimate per column:
    * (column, n_rows, n_batches, estimate). `allowDifferentLgK` permits
    * mixing sketch precisions across batches (union degrades to the
    * coarsest — keep lgK stable in production). */
  def estimateCardinalities(spark: SparkSession, dir: String,
                            allowDifferentLgK: Boolean = false): DataFrame =
    spark.read.parquet(dir)
      // an EMPTY ingest batch writes a null sketch (hll_sketch_agg of no
      // rows); it carries no distinct mass — drop it before the union
      .filter(col("sketch").isNotNull)
      .groupBy("column")
      .agg(sum("n_rows").as("n_rows"),
        sum("n_batches").as("n_batches"),
        hll_sketch_estimate(
          hll_union_agg(col("sketch"), lit(allowDifferentLgK))).as("estimate"))

  /** Fold the accumulated per-batch cardinality rows into ONE base row
    * per column: register-max sketch union, n_rows / n_batches sums —
    * all over the non-null-sketch rows [[estimateCardinalities]] serves
    * from, so estimates are bit-identical pre/post fold (union merge is
    * associative and the serve path estimates from merged register
    * state). */
  def compactCardinalitySketches(spark: SparkSession, dir: String): Unit = {
    if (!exists(spark, dir)) return
    swapInFolded(spark, dir,
      spark.read.parquet(dir)
        .filter(col("sketch").isNotNull)
        .groupBy("column")
        .agg(sum("n_rows").as("n_rows"), sum("n_batches").as("n_batches"),
          hll_union_agg(col("sketch"), lit(false)).as("sketch")))
  }

  // ---------------- Count-Min frequency sketches ----------------------

  /** Row-r bucket of `key`: the engine-portable 52-bit md5 integer of
    * `key|cms<r>` mod `width` — deterministic, identical in any engine
    * with md5 (the q26 uniform's numerator), so estimates replay in SQL
    * exactly (q115). */
  private def cmsBucket(key: Column, r: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", key, lit(s"cms$r")).cast("binary")),
      1, 13), 16, 10).cast("long"), lit(width.toLong))

  /** Append one Count-Min sketch of `key`'s frequency distribution for
    * this batch (Cormode & Muthukrishnan 2005, public): `depth` hash
    * rows × `width` buckets, stored SPARSE as (batch_id, r, bucket, cnt)
    * rows — merging batches is a (r, bucket) count-sum, so the artifact
    * is exactly mergeable and the serve path never rescans history.
    * Point estimates overcount (never undercount) with error ≤ 2n/width
    * at 1 − (1/2)^depth. Same layout/idempotence contract as
    * [[appendCardinalitySketches]]. */
  def appendFrequencySketches(df: DataFrame, key: Column, dir: String,
                              batchId: Long, depth: Int = 4,
                              width: Int = 1024): Unit = {
    require(depth >= 1 && depth <= 16, "depth must be in 1..16")
    require(width >= 16, "width must be >= 16")
    if (batchId <= foldedWatermark(df.sparkSession, dir)) return
    deleteBatchPartition(df.sparkSession, dir, batchId)
    val rows = df.select(key.cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(posexplode(array((0 until depth).map(r =>
        cmsBucket(col("__k"), r, width)): _*)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
      .select(lit(batchId).as("batch_id"), col("r"), col("bucket"), col("cnt"))
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rows.coalesce(1).write.mode("overwrite")
      .partitionBy("batch_id").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Fold the accumulated per-batch CMS cells into one base cell per
    * (r, bucket): count-sum merge — exactly the arithmetic the serve path
    * runs, so [[cmsEstimate]] is bit-identical pre/post fold. */
  def compactFrequencySketches(spark: SparkSession, dir: String): Unit = {
    if (!exists(spark, dir)) return
    swapInFolded(spark, dir,
      spark.read.parquet(dir)
        .groupBy("r", "bucket").agg(sum("cnt").as("cnt")))
  }

  // ---------------- fixed-edge histogram quantiles ---------------------

  /** Append one fixed-edge equi-width histogram of `valueCol` for this
    * batch: (batch_id, bin, cnt) with
    * `bin = clamp(floor((x − lo)/((hi − lo)/bins)), 0, bins−1)` — FIXED
    * `[lo, hi)` edges are what make the artifact mergeable (cnt-sum per
    * bin), completing the ingest-sketch triad: HLL = cardinality, CMS =
    * frequency, this = distribution/quantiles. Error of any quantile
    * estimate is bounded by one bin width; values outside [lo, hi] clamp
    * into the edge bins (size the range from a profiling pass). Same
    * layout/idempotence contract as the other append* sketches. */
  def appendHistogramSketches(df: DataFrame, valueCol: Column, dir: String,
                              batchId: Long, lo: Double, hi: Double,
                              bins: Int = 256): Unit = {
    require(bins >= 2 && hi > lo, "need bins >= 2 and hi > lo")
    if (batchId <= foldedWatermark(df.sparkSession, dir)) return
    deleteBatchPartition(df.sparkSession, dir, batchId)
    val w = (hi - lo) / bins
    val bin = least(greatest(
      floor((valueCol.cast("double") - lit(lo)) / lit(w)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    val rows = df.select(bin.as("bin")).filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .select(lit(batchId).as("batch_id"), col("bin"), col("cnt"))
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rows.coalesce(1).write.mode("overwrite")
      .partitionBy("batch_id").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Fold the accumulated per-batch histogram cells into one base cell
    * per bin — count-sum merge, the serve arithmetic, so
    * [[histQuantiles]] is bit-identical pre/post fold. */
  def compactHistogramSketches(spark: SparkSession, dir: String): Unit = {
    if (!exists(spark, dir)) return
    swapInFolded(spark, dir,
      spark.read.parquet(dir)
        .groupBy("bin").agg(sum("cnt").as("cnt")))
  }

  /** Quantile estimates from the merged batch histograms. For each q:
    * target rank `t = q·n`; the estimate interpolates linearly inside
    * the first bin whose cumulative count reaches t:
    * `lo + (bin + (t − cumBefore)/cnt) · w`, rounded to 6. The merged
    * cell frame is ≤`bins` rows BY CONSTRUCTION, so the cumulative walk
    * runs on the driver (a data-sized global window would trip the plan
    * guards for nothing); the distributed read is (batches × ≤bins)
    * rows regardless of corpus size. */
  def histQuantiles(spark: SparkSession, dir: String, qs: Seq[Double],
                    lo: Double, hi: Double, bins: Int = 256): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), "qs must be in [0,1]")
    import spark.implicits._
    val w = (hi - lo) / bins
    val cells = spark.read.parquet(dir)
      .groupBy("bin").agg(sum("cnt").as("cnt"))
      .orderBy("bin")
      .collect() // ≤ bins rows — bounded by the sketch's construction
      .map(r => (r.getLong(0), r.getLong(1)))
    require(cells.nonEmpty, "histQuantiles: no histogram mass in the sketch dir")
    val n = cells.map(_._2).sum.toDouble
    def round6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val out = qs.distinct.map { q =>
      val t = q * n
      var cum = 0L
      var i = 0
      while (i < cells.length && cum.toDouble < t) { cum += cells(i)._2; i += 1 }
      val idx = math.max(i - 1, 0)
      val (bin, cnt) = cells(idx)
      // i == 0 only when t == 0: the SQL replay then picks the first
      // cell with zero preceding mass, not a negative cumBefore
      val cumBefore = if (i == 0) 0.0 else (cum - cnt).toDouble
      (q, round6(lo + (bin.toDouble + (t - cumBefore) / cnt.toDouble) * w))
    }
    out.toDF("q", "estimate")
  }

  // ---------------- KMV (k-minimum-values / theta) sketches ------------

  /** The engine-portable 52-bit md5 integer of `key` under the "kmv" salt
    * (the q26/q115 device) — the uniform hash whose k smallest DISTINCT
    * values form the sketch. */
  private def kmvHash(key: Column): Column =
    conv(substring(md5(concat_ws("|", key, lit("kmv")).cast("binary")),
      1, 13), 16, 10).cast("long")

  /** 2^52 — the hash space; normalized hash u = h / 2^52 ∈ [0, 1). */
  private val KmvSpace = 4503599627370496.0

  /** (k−1)/u_(k) when the sketch is full, the exact kept count when it
    * holds the whole value set. (k−1)·2^52 is exactly representable
    * (≤ 2^64-ish with a ≤ 12-bit mantissa head), so the expression is one
    * IEEE product + quotient — identical in any engine. */
  private def kmvEstimateCol(nKept: Column, hk: Column, k: Int): Column =
    when(nKept < k, nKept.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(KmvSpace) / hk.cast("double"))

  private def fence6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Append this batch's KMV sketch of `key`: the k smallest distinct
    * hash values as (batch_id, h) rows — ≤ 8k bytes of payload. KMV
    * (Bar-Yossef et al. 2002; Beyer et al. 2007's unbiased estimator —
    * public methods) is the sketch family with cheap SET OPERATIONS:
    * merging is "union + keep k smallest" (order-independent, hence
    * split-invariant like the HLL registers), and because the k-min
    * sample of a union is a uniform sample of its distinct values,
    * intersection / Jaccard / overlap estimates come from membership
    * counts ([[kmvOverlap]]) — arithmetic HLL register state cannot
    * answer. Fully DETERMINISTIC (md5, no seeds, no insertion-order
    * sensitivity), so every estimate replays exactly in SQL (q129).
    *
    * 100 TB shape: one scan; the partial-aggregate distinct on the
    * 8-byte hash runs map-side, TakeOrdered(k) cuts the rest — the
    * artifact is ≤ k rows per batch and the serve cost is
    * (batches × k) rows, constant in corpus size. Same layout /
    * retry-delete / fold contract as the other sketch families. */
  def appendKmvSketches(df: DataFrame, key: Column, dir: String,
                        batchId: Long, k: Int = 1024): Unit = {
    require(k >= 16, "k must be >= 16")
    if (batchId <= foldedWatermark(df.sparkSession, dir)) return
    deleteBatchPartition(df.sparkSession, dir, batchId)
    val rows = df.select(key.cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(kmvHash(col("__k")).as("h"))
      .distinct().orderBy("h").limit(k)
      .select(lit(batchId).as("batch_id"), col("h"))
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rows.coalesce(1).write.mode("overwrite")
      .partitionBy("batch_id").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** The served sketch: the k smallest distinct hashes across batches. */
  private def kmvTopK(spark: SparkSession, dir: String, k: Int): DataFrame =
    spark.read.parquet(dir).select("h").distinct().orderBy("h").limit(k)

  /** Distinct-count estimate over the accumulated batches — one row
    * (n_kept, estimate): exact when fewer than k distinct hashes exist
    * (the sketch then IS the value set), else the order-statistics
    * estimator (k−1)/u_(k); 6-dp arithmetic fence. */
  def kmvEstimate(spark: SparkSession, dir: String, k: Int = 1024): DataFrame =
    kmvTopK(spark, dir, k)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("__hk"))
      .select(col("n_kept"),
        fence6(kmvEstimateCol(col("n_kept"), col("__hk"), k)).as("estimate"))

  /** Set-operation estimates between two sketch dirs — corpus-overlap
    * auditing ("how much of snapshot B is already in A?") at constant
    * serve cost. The k smallest distinct hashes of sketchA ∪ sketchB are
    * a valid k-min sample of A ∪ B: when both sketches are full their
    * combined k-th minimum is ≤ both thresholds (each sketch alone
    * contributes k values under its own θ), and a non-full sketch is its
    * complete value set — so membership of every sampled hash in A and B
    * is decided EXACTLY by the sketches. With ρ = n_both / n_kept:
    * |A ∪ B| ≈ (k−1)/u_(k), |A ∩ B| ≈ ρ · |A ∪ B|, Jaccard ≈ ρ
    * (Beyer et al. 2007). One row: (n_kept, n_both, union_est,
    * inter_est, jaccard), estimates 6-dp fenced. */
  def kmvOverlap(spark: SparkSession, dirA: String, dirB: String,
                 k: Int = 1024): DataFrame = {
    val a = spark.read.parquet(dirA).select("h").distinct()
    val b = spark.read.parquet(dirB).select("h").distinct()
    val u = a.unionByName(b).distinct().orderBy("h").limit(k)
    val flagged = u
      .join(a.select(col("h"), lit(1L).as("__in_a")), Seq("h"), "left")
      .join(b.select(col("h"), lit(1L).as("__in_b")), Seq("h"), "left")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("__hk"),
        sum(when(col("__in_a") === 1L && col("__in_b") === 1L, 1L)
          .otherwise(0L)).as("n_both"))
    val est = kmvEstimateCol(col("n_kept"), col("__hk"), k)
    val rho = col("n_both").cast("double") / col("n_kept").cast("double")
    flagged.select(col("n_kept"), col("n_both"),
      fence6(est).as("union_est"),
      fence6(rho * est).as("inter_est"),
      fence6(rho).as("jaccard"))
  }

  /** Fold the accumulated per-batch KMV rows into the base partition:
    * distinct + k smallest — exactly the serve-path arithmetic, so
    * [[kmvEstimate]]/[[kmvOverlap]] are bit-identical pre/post fold. */
  def compactKmvSketches(spark: SparkSession, dir: String,
                         k: Int = 1024): Unit = {
    if (!exists(spark, dir)) return
    swapInFolded(spark, dir, kmvTopK(spark, dir, k))
  }

  // ---------------- bottom-k rank (quantile) sketches ------------------

  /** The engine-portable 52-bit md5 integer of a ROW key under the "rank"
    * salt — unlike [[kmvHash]] there is no distinct: each row draws its
    * own uniform, so the k rows with the smallest hashes are a simple
    * random sample OF ROWS (Bar-Yossef et al.'s bottom-k device pointed
    * at rank statistics instead of distinct counts). */
  private def rankHash(key: Column): Column =
    conv(substring(md5(concat_ws("|", key, lit("rank")).cast("binary")),
      1, 13), 16, 10).cast("long")

  /** Append this batch's RANK sketch of `value`: the k rows with the
    * smallest row-key hashes, carrying their values — the mergeable
    * quantile sketch that, unlike the fixed-edge histogram family
    * ([[appendHistogramSketches]]), needs NO prior knowledge of the value
    * range: the retained values are a deterministic uniform row sample,
    * so every quantile of the sample estimates the corpus quantile with
    * rank error ≤ √(ln(2/δ)/2k) (Dvoretzky–Kiefer–Wolfowitz; k=4096 ⇒
    * ≤ 4.3% at δ=1e-6). Merging is "union + keep k smallest" exactly as
    * KMV — any of the k overall-smallest rows is among its own batch's k
    * smallest — so batching is invariant and fully deterministic (md5,
    * no seeds): every estimate replays exactly in SQL (q148).
    *
    * `key` must be unique per row (it is the sampling coin — duplicate
    * keys would enter the sample together or not at all and bias heavy
    * values); NULL values drop before sampling.
    *
    * 100 TB shape: one scan; TakeOrdered(k) cuts map-side — each task
    * retains ≤ k (hash, value) pairs and the artifact is ≤ k rows per
    * batch. Serve reads (batches × k) rows, constant in corpus size.
    * Same layout / retry-delete / fold contract as the other families. */
  def appendRankSketches(df: DataFrame, value: Column, key: Column,
                         dir: String, batchId: Long, k: Int = 4096): Unit = {
    require(k >= 16, "k must be >= 16")
    // k is part of the artifact's identity: appends at a different k than
    // the dir was built with would make the union no longer a uniform
    // bottom-k row sample (small batches over-represented). Validate
    // against the persisted k and stamp it on first append.
    storedRankK(df.sparkSession, dir).foreach(k0 => require(k0 == k,
      s"appendRankSketches: k=$k but artifact $dir was built with k=$k0"))
    if (batchId <= foldedWatermark(df.sparkSession, dir)) return
    deleteBatchPartition(df.sparkSession, dir, batchId)
    val rows = df
      .select(rankHash(key.cast("string")).as("h"),
        value.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .orderBy("h", "v").limit(k) // (h, v) order: boundary ties deterministic
      .select(lit(batchId).as("batch_id"), col("h"), col("v"))
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rows.coalesce(1).write.mode("overwrite")
      .partitionBy("batch_id").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    writeRankK(spark, dir, k) // idempotent restamp (validated equal above)
  }

  /** Sidecar filename for the rank sketch's k — underscore-prefixed so the
    * parquet reader ignores it alongside the data files (the
    * `_folded_watermark` convention). */
  private val RankKFile = "_rank_k"

  /** The k this rank artifact was built with, if stamped. */
  private[graft] def storedRankK(spark: SparkSession, dir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir, RankKFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
      finally in.close()
    }
  }

  private def writeRankK(spark: SparkSession, dir: String, k: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, RankKFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(k.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Resolve the k to serve/compact at: the persisted artifact k wins;
    * an EXPLICIT caller k must match it (serving with a larger k than the
    * appends used would read the raw union of per-batch samples — no
    * longer a uniform row sample, quantiles biased toward small batches).
    * `k < 0` (the default) means "use the stored k"; a pre-stamp artifact
    * with no sidecar falls back to the historical default 4096. */
  private def resolveRankK(spark: SparkSession, dir: String, k: Int): Int = {
    val stored = storedRankK(spark, dir)
    stored.foreach(k0 => require(k < 0 || k == k0,
      s"rank sketch $dir was built with k=$k0 but k=$k was requested"))
    if (k >= 0) k else stored.getOrElse(4096)
  }

  /** The served sketch: the k hash-smallest sampled rows across batches. */
  private def rankTopK(spark: SparkSession, dir: String, k: Int): DataFrame =
    spark.read.parquet(dir).select("h", "v").orderBy("h", "v").limit(k)

  /** GROUP-WISE rank sketches in one aggregate: per group, the k rows
    * with the smallest (row-key hash, value) pairs, kept by a bounded
    * [[BottomKRankAggregator]] — the same shape argument as
    * [[Selection.topKPerGroup]]: the window form
    * (`row_number().over(partitionBy(group).orderBy(h))`) sorts every
    * group's FULL contents through the exchange; this carries at most k
    * (h, v) pairs per group per map partition, so per-group quantiles
    * over a 100 TB fact table are one scan + a k-bounded shuffle.
    * Quantile estimates are each group's empirical sample quantiles at
    * `max(⌈q·m⌉, 1)` — the [[rankQuantiles]] arithmetic, DKW rank error
    * ≤ √(ln(2/δ)/2k) per group. Output: (groups..., q, estimate, m). */
  def groupRankQuantiles(df: DataFrame, groups: Seq[String], value: Column,
                         key: Column, qs: Seq[Double],
                         k: Int = 1024): DataFrame = {
    require(k >= 16, "k must be >= 16")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0,1]")
    val bk = udaf(new BottomKRankAggregator(k),
      org.apache.spark.sql.Encoders.product[RankHV])
    val sample = df
      .select(groups.map(col) :+ rankHash(key.cast("string")).as("__h") :+
        value.cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(groups.map(col): _*)
      .agg(bk(col("__h"), col("__v")).as("__s"))
      .select(groups.map(col) :+ size(col("__s")).cast("long").as("m") :+
        array_sort(transform(col("__s"), x => x.getField("v"))).as("__vs"): _*)
    val qArr = explode(array(qs.distinct.map(lit): _*)).as("q")
    sample.select(groups.map(col) :+ col("m") :+ col("__vs") :+ qArr: _*)
      .select(groups.map(col) :+ col("q") :+
        element_at(col("__vs"),
          greatest(ceil(col("q") * col("m").cast("double")), lit(1L))
            .cast("int")).as("estimate") :+ col("m"): _*)
  }

  /** Fold the accumulated per-batch rank rows into the base partition:
    * union + k smallest — exactly the serve-path arithmetic, so
    * [[rankQuantiles]] is bit-identical pre/post fold. k defaults to the
    * artifact's persisted k ([[resolveRankK]]); the sidecar is staged
    * WITH the folded data so the swap keeps data, watermark and k
    * visible together. */
  def compactRankSketches(spark: SparkSession, dir: String,
                          k: Int = -1): Unit = {
    if (!exists(spark, dir)) return
    val kEff = resolveRankK(spark, dir, k)
    val maxBatch = ArtifactFold.liveMaxBatch(spark, dir)
    rankTopK(spark, dir, kEff).withColumn("batch_id", lit(-1L))
      .coalesce(1).write.mode("overwrite").partitionBy("batch_id")
      .parquet(ArtifactFold.stagePath(dir))
    writeRankK(spark, ArtifactFold.stagePath(dir), kEff)
    ArtifactFold.commitFold(spark, dir, maxBatch)
  }

  /** Quantile estimates over the accumulated batches: the sample's
    * empirical quantile — sort the ≤k retained values, pick position
    * `max(⌈q·m⌉, 1)` (1-based). Exact when the sample holds the whole
    * corpus (m = n < k). The merged sample is ≤ k rows BY CONSTRUCTION,
    * so the pick runs on the driver (the [[histQuantiles]] argument); the
    * distributed read is (batches × k) rows regardless of corpus size.
    * Returns (q, estimate) with the estimate a VERBATIM sampled value —
    * no interpolation, no fence needed: both engines read the same
    * parquet double. k defaults to the artifact's persisted k; an
    * explicit k must match it ([[resolveRankK]]). */
  def rankQuantiles(spark: SparkSession, dir: String, qs: Seq[Double],
                    k: Int = -1): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must be in (0,1]")
    import spark.implicits._
    val sample = rankTopK(spark, dir, resolveRankK(spark, dir, k))
      .collect() // ≤ k rows — bounded by the sketch's construction
      .map(_.getDouble(1)).sorted
    require(sample.nonEmpty, "rankQuantiles: no sample mass in the sketch dir")
    val m = sample.length
    qs.distinct.map { q =>
      val idx = math.max(math.ceil(q * m).toLong, 1L).toInt
      (q, sample(idx - 1))
    }.toDF("q", "estimate")
  }

  /** Point-frequency estimates for `keys` over the accumulated batches:
    * min over hash rows of the summed bucket counts — (key, estimate).
    * Absent keys estimate ≥ 0 (collision mass only). The probe list is a
    * broadcast local relation; the sketch read is (batches × depth ×
    * ≤width) rows regardless of corpus size. */
  def cmsEstimate(spark: SparkSession, dir: String, keys: Seq[String],
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    require(keys.nonEmpty, "need at least one probe key")
    import spark.implicits._
    val probes = keys.distinct.toDF("key")
      .select(col("key"), posexplode(array((0 until depth).map(r =>
        cmsBucket(col("key"), r, width)): _*)).as(Seq("r", "bucket")))
    val cells = spark.read.parquet(dir)
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    probes.join(cells, Seq("r", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
  }
}
