package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — DSIR (Xie et al. 2023,
  * arXiv:2302.03169, public), hashed-unigram variant: score every document
  * by how much more likely its tokens are under a TARGET distribution
  * (e.g. a trusted high-quality subset) than under the raw-corpus
  * distribution, then keep the top fraction. This is the
  * distribution-MATCHING selection family, orthogonal to the rule
  * thresholds ([[QualityRules]]) and dedup families: rules judge each doc
  * in isolation; DSIR judges it against what the corpus should look like.
  *
  * Token features hash into `buckets` counts; per-bucket add-one-smoothed
  * log probability ratios come back to the driver as ONE B-element array
  * (B doubles — bounded regardless of corpus size) and the per-doc score
  * is an ordered fold over the token array against that array literal.
  * 100 TB shape: one count scan (B-key hash aggregate, map-side combine —
  * the shuffle carries ≤ B×partitions rows), one scoring projection (no
  * shuffle, no UDF), and a range-partitioned global rank
  * ([[Ranking.globalRowNumber]]) for the keep flag — no single-task sort
  * anywhere.
  *
  * The token hash is the md5 fold (first 6 hex chars mod B) so the DuckDB
  * oracle replays bucketing bit-for-bit (the [[Mixture.portableUniform]]
  * convention); a production deployment would swap in xxhash64
  * ([[graft.functions.TextOps.fingerprint64]] precedent) — same plan
  * shape. Scores are ROUNDED to 6 dp before the rank comparison so ulp
  * differences between engines' `ln`/sum order can never flip a
  * selection decision (ties then break on doc id).
  */
object Dsir {

  /** Hash bucket of one token: integer value of the first 6 md5 hex chars
    * (< 16⁷, exact in a long in any engine) mod `buckets`. */
  def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok.cast("binary")), 1, 6), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Per-bucket add-one-smoothed log ratios
    * `ln p_target(b) − ln p_corpus(b)` from ONE pass over the exploded
    * tokens (`isTarget` marks the target rows; target ⊆ corpus). Buckets
    * no token hashes to get the pure-smoothing ratio — the oracle mirrors
    * this by densifying over `range(buckets)`. */
  def hashedLogRatios(df: DataFrame, tokens: Column, isTarget: Column,
                      buckets: Int): Array[Double] = {
    val counts = df.select(explode(tokens).as("__t"),
        isTarget.cast("long").as("__f"))
      .select(bucketOf(col("__t"), buckets).as("__b"), col("__f"))
      .groupBy("__b").agg(count(lit(1)).as("tot"), sum("__f").as("tgt"))
      .collect() // ≤ `buckets` rows — bounded driver pull
    val tot = Array.fill(buckets)(0L)
    val tgt = Array.fill(buckets)(0L)
    counts.foreach { r =>
      val b = r.getAs[Long]("__b").toInt
      tot(b) = r.getAs[Long]("tot"); tgt(b) = r.getAs[Long]("tgt")
    }
    val totAll = tot.sum.toDouble + buckets
    val tgtAll = tgt.sum.toDouble + buckets
    Array.tabulate(buckets)(b =>
      math.log((tgt(b) + 1.0) / tgtAll) - math.log((tot(b) + 1.0) / totAll))
  }

  /** Importance score of a token array: ordered fold of per-token bucket
    * log ratios against the B-element literal — one codegen-able
    * projection, deterministic order (so the SQL replay folds
    * identically). */
  def scoreCol(tokens: Column, logRatios: Array[Double], buckets: Int): Column = {
    val lr = typedLit(logRatios.toSeq)
    aggregate(tokens, lit(0.0),
      (acc, t) => acc + element_at(lr, bucketOf(t, buckets).cast("int") + 1))
  }

  /** Full DSIR selection: `(doc_id, score, selected)` — score rounded to
    * 6 dp, `selected = 1` for the `frac` top documents by
    * (score desc, doc_id). `keepN = floor(n · frac)` uses the corpus
    * count (one aggregate). */
  def select(df: DataFrame, id: Column, tokens: Column, isTarget: Column,
             buckets: Int = 256, frac: Double = 0.25): DataFrame = {
    require(buckets >= 1 && frac >= 0 && frac <= 1, "need buckets>=1, frac in [0,1]")
    val lr = hashedLogRatios(df, tokens, isTarget, buckets)
    val scored = df.select(id.cast("long").as("doc_id"),
      round(scoreCol(tokens, lr, buckets), 6).as("score"))
    val n = scored.count()
    val keepN = math.floor(n * frac).toLong
    Ranking.globalRowNumber(scored,
        Seq(col("score").desc, col("doc_id").asc), out = "__rn")
      .select(col("doc_id"), col("score"),
        when(col("__rn") <= keepN, 1L).otherwise(0L).as("selected"))
  }
}
