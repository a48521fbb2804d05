package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fold/compaction plumbing for every `batch_id=N`-partitioned
  * incremental artifact (sketches, streaming admission histories): fold
  * the accumulated per-batch partitions into the reserved base partition
  * `batch_id=-1`, record a fold watermark, and make replays of folded
  * batches no-ops in the corresponding append path. Without this, every
  * continuously-ingesting artifact accretes one partition (and at least
  * one file) per batch forever — the small-files failure mode
  * [[Retrieval.compactBm25Postings]] first fixed for postings.
  *
  * Crash posture (the round-7 advice, applied uniformly): the watermark
  * is written INTO the staging dir, so watermark and folded data become
  * visible together at the rename swap — a crash before the swap leaves
  * the per-batch layout and the old watermark fully intact; the
  * no-live-dir window is two namenode metadata ops with the previous
  * data recoverable under `__fold_old`. Folding is NOT transactional
  * against concurrent readers or writers — run it in the maintenance
  * window (streams stopped).
  *
  * Batch-id contract: ids must be monotone over the artifact's lifetime
  * (for streaming twins that means one stable checkpoint lineage — a
  * fresh checkpoint restarts micro-batch ids at 0, which the watermark
  * would wrongly no-op; compact only artifacts whose ingest keeps its
  * checkpoint).
  */
private[graft] object ArtifactFold {

  /** Watermark filename INSIDE the artifact dir — underscore-prefixed so
    * Spark's parquet reader ignores it alongside the data files. */
  private val WatermarkFile = "_folded_watermark"

  /** Highest batch id folded into the base partition (Long.MinValue if
    * never compacted) — the no-op-replay guard for append paths.
    * Refuses fold crash debris FIRST: with the live dir gone
    * mid-[[commitFold]], "no watermark file" would read as "never
    * compacted" and the caller would rebuild/re-admit against an
    * artifact whose only copy sits under `__fold_old` — silently. Every
    * append and history-load path consults the watermark, so this is
    * the shared refuse point. */
  def foldedWatermark(spark: SparkSession, dir: String): Long = {
    requireNoCrashDebris(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, WatermarkFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Stamp `value` as the fold watermark of `dir` directly (no fold) —
    * the migration hook for artifacts written under a legacy watermark
    * convention. Normal folds never call this: [[commitFold]] stamps
    * the watermark into the staged dir so it appears with the data. */
  private[operators] def writeWatermark(spark: SparkSession, dir: String,
                                        value: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, WatermarkFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(value.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Retry safety shared by append paths: drop this batch's partition
    * BEFORE the write. Dynamic partition overwrite only replaces
    * partitions present in the retry's output — a retry whose input went
    * empty (or lost rows) would otherwise leave the first attempt's
    * stale partition to double-count. Refuses fold crash debris first
    * (every append path deletes before writing, so this is the shared
    * refuse point for appends that skipped the watermark consult). */
  def deleteBatchPartition(spark: SparkSession, dir: String,
                           batchId: Long): Unit = {
    requireNoCrashDebris(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/batch_id=$batchId")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Refuse to touch an artifact left in [[commitFold]]'s between-renames
    * crash window: `<dir>__fold_old` present with no live dir means the
    * old dir holds the ONLY copy of the data — an append that blindly
    * recreated the live dir would orphan all pre-crash history, and the
    * next fold's debris delete would then destroy it. Recovery is one
    * manual rename back. Append paths call this before writing. */
  def requireNoCrashDebris(spark: SparkSession, dir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + "__fold_old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(old) || fs.exists(live),
      s"fold crash debris: $old exists without $live — rename it back " +
        "to recover before appending or folding")
  }

  /** The staging dir a fold writes into before [[commitFold]] swaps it
    * live. `write.mode("overwrite")` clears any crashed prior attempt. */
  def stagePath(dir: String): String = dir + "__fold_tmp"

  /** Highest live batch id merged with the previous watermark, so
    * compacting an already-fully-compacted dir can't regress it. */
  def liveMaxBatch(spark: SparkSession, dir: String): Long =
    math.max(
      spark.read.parquet(dir).agg(max(col("batch_id").cast("long")))
        .head().getLong(0),
      foldedWatermark(spark, dir))

  /** Stamp the watermark INTO the staged dir, then swap it live with two
    * renames. Watermark and folded data become visible together: a crash
    * before the swap leaves the per-batch layout and old watermark fully
    * intact; the no-live-dir window is two namenode metadata ops with the
    * previous data recoverable under `__fold_old`. The caller must have
    * fully written the staged layout (any partitioning) first. */
  def commitFold(spark: SparkSession, dir: String, maxBatch: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(stagePath(dir))
    val old = new org.apache.hadoop.fs.Path(dir + "__fold_old")
    if (fs.exists(old)) {
      // old WITH live = debris from a crash after the swap: safe to clear.
      // old WITHOUT live = crash BETWEEN the renames — `old` is the only
      // copy; deleting it here would destroy the artifact, so refuse.
      require(fs.exists(live),
        s"fold crash debris: $old exists without $live — rename it back " +
          "to recover before folding")
      fs.delete(old, true)
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, WatermarkFile), true)
    try out.write(maxBatch.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(live, old), s"rename failed for $live")
    require(fs.rename(tmp, live), s"rename failed for $tmp")
    fs.delete(old, true)
  }

  /** Materialize `folded` (must NOT carry a batch_id column) under the
    * reserved base partition `batch_id=-1` in the staging dir, then
    * [[commitFold]]. `targetFiles` bounds the folded file count:
    * sketch-sized artifacts pass 1; pass 0 for SIZE-AWARE sizing — no
    * manual coalesce, AQE's partition coalescing collapses the fold
    * aggregate's shuffle output to advisory-sized partitions, so a tiny
    * artifact still lands as one file while a corpus-shaped one (the
    * anchors side of a link artifact) fans out instead of funneling
    * through a one-task write. */
  def swapInFolded(spark: SparkSession, dir: String, folded: DataFrame,
                   targetFiles: Int): Unit = {
    require(targetFiles >= 0, "targetFiles: 0 (size-aware) or >= 1")
    val maxBatch = liveMaxBatch(spark, dir)
    val sized =
      if (targetFiles >= 1) folded.coalesce(targetFiles)
      else if (spark.conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled",
          "true").toBoolean)
        folded // AQE collapses the fold aggregate to advisory-sized files
      else {
        // AQE off: without this, the fold writes one near-empty file per
        // shuffle partition and re-accretes the small files it exists to
        // remove. Size-aware fallback from the live artifact's bytes (the
        // folded aggregate is no larger than its input) at 64 MiB/file.
        val live = new org.apache.hadoop.fs.Path(dir)
        val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bytes = fs.getContentSummary(live).getLength
        folded.coalesce(math.max(1L, math.min(
          spark.sparkContext.defaultParallelism.toLong,
          (bytes + (64L << 20) - 1) / (64L << 20))).toInt)
      }
    sized.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(stagePath(dir))
    commitFold(spark, dir, maxBatch)
  }
}
