package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
