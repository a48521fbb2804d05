package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture sampling — reweighting corpus sources into a training mix
  * ("wiki ×2.5, web ×0.15, …"), the step that turns a curated corpus into
  * a recipe. Per document, the target weight `w` for its source yields
  * `floor(w)` guaranteed epochs plus one more with probability
  * `frac(w)` — deterministic, via the engine-portable 52-bit md5 uniform
  * (the q26 construction), so the sample is reproducible run-to-run,
  * executor-count-independent, and exactly replayable in SQL (the q62
  * oracle). One projection + one generate: no shuffle, no state; at
  * 100 TB this runs at scan speed and the downstream shuffle (packing,
  * shard writes) sees the already-reweighted stream. */
object Mixture {

  /** Engine-portable uniform in [0, 1) keyed by (key, salt) — delegates to
    * the single canonical construction in
    * [[graft.functions.TextOps.portableUniform52]]. */
  def portableUniform(key: Column, salt: String): Column =
    graft.functions.TextOps.portableUniform52(concat_ws("|", key, lit(salt)))

  /** Weight column from a source→weight table (unmatched sources get
    * `default`). Weights may exceed 1 (upsampling). */
  def weightFor(source: Column, weights: Map[String, Double],
                default: Double): Column =
    weights.foldLeft(lit(default)) { case (acc, (s, w)) =>
      when(source === lit(s), lit(w)).otherwise(acc)
    }

  /** Temperature-based source reweighting (the mT5/multilingual-T5 α
    * scheme, Xue et al. 2021 — public): a source holding share p of the
    * corpus gets sampling share q ∝ p^alpha, flattening the head and
    * boosting the tail as alpha → 0 (alpha = 1 keeps natural
    * proportions). Output per source: natural share, target share, and
    * the per-document expected-copy `weight = q·targetRows/n` to feed
    * [[epochs]]. All derived columns rounded to 9 (engine-portable
    * fence). One tiny aggregate per corpus scan — the per-source frame is
    * sources-sized, broadcast everywhere. */
  def temperatureWeights(docs: DataFrame, source: Column, alpha: Double,
                         targetRows: Long): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    require(targetRows > 0, "targetRows must be positive")
    val counts = docs.groupBy(source.as("source")).agg(count(lit(1)).as("n_docs"))
    val withP = counts
      .crossJoin(broadcast(counts.agg(sum("n_docs").cast("double").as("nn"))))
      .withColumn("p", col("n_docs").cast("double") / col("nn"))
      .withColumn("pa", pow(col("p"), lit(alpha)))
    withP.crossJoin(broadcast(withP.agg(sum("pa").as("za"))))
      .select(col("source"), col("n_docs"),
        round(col("p"), 9).as("share_before"),
        round(col("pa") / col("za"), 9).as("share_after"),
        round(col("pa") / col("za") * lit(targetRows.toDouble) /
          col("n_docs").cast("double"), 9).as("weight"))
  }

  /** Expand each document into its mixture epochs: rows (…, epoch) with
    * epoch in [0, nCopies) where
    * `nCopies = floor(w) + (u < frac(w) ? 1 : 0)`. Documents drawn zero
    * times disappear. Deterministic in (id, salt). */
  def epochs(docs: DataFrame, id: Column, weight: Column,
             salt: String = "mix"): DataFrame = {
    val u = portableUniform(id, salt)
    val copies = (floor(weight) +
      when(u < weight - floor(weight), 1.0).otherwise(0.0)).cast("long")
    docs
      .withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Token-budget mixture planner — the static planning step of corpus
    * mixing (The Pile / DoReMi-style fixed domain weights): given a total
    * training token budget and a target weight per domain, derive each
    * domain's available tokens, its target share, the implied epoch count
    * (>1 = upsampling, the Pile runs Wikipedia ~3 epochs), and the
    * capped-at-1 sampling rate for pipelines that refuse to upsample.
    * Domains absent from `targets` get weight 0 (excluded from training but
    * still reported); target domains absent from the CORPUS are reported
    * with zero availability (epochs 0) rather than silently dropping their
    * budget share. Output is one row per domain, so the whole plan is a
    * single partial-aggregatable groupBy at any corpus size; the weight
    * ladder is a broadcast-free literal CASE.
    *
    * epochs = target_tokens / available; feeding `weightFor`-style
    * per-document weights into [[epochs]] then materializes the plan. */
  def tokenBudgetPlan(docs: DataFrame, domain: Column, tokens: Column,
                      targets: Map[String, Double], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(targets.values.forall(_ >= 0), "weights must be >= 0")
    val wSum = targets.values.sum
    require(wSum > 0, "need a positive total weight")
    val w = weightFor(col("domain"), targets.map { case (k, v) => k -> v / wSum },
      default = 0.0)
    val spark = docs.sparkSession
    import spark.implicits._
    val present = docs.select(domain.as("domain"), tokens.cast("long").as("__t"))
      .groupBy("domain")
      .agg(sum("__t").as("available_tokens"), count(lit(1)).as("n_docs"))
    // a target domain ABSENT from the corpus must still plan (with zero
    // availability) — silently dropping it makes part of the budget vanish
    // and hides a typo'd domain name
    present
      .join(targets.keys.toSeq.toDF("domain"), Seq("domain"), "full_outer")
      .na.fill(0L, Seq("available_tokens", "n_docs"))
      .withColumn("weight", round(w, 6))
      .withColumn("target_tokens", round(w * budget, 2))
      .withColumn("epochs",
        round(when(col("available_tokens") > 0,
          col("target_tokens") / col("available_tokens")).otherwise(lit(0.0)), 6))
      .withColumn("sample_rate", round(least(col("epochs"), lit(1.0)), 6))
  }

  /** Deterministic hash split — the train/val/test (or shard) assignment a
    * training pipeline makes ONCE and must never change afterwards: each
    * row's uniform `u = md5-uniform(key, salt)` picks the first label whose
    * cumulative fraction exceeds it. Properties the rand()-based
    * `randomSplit` cannot give: stable under re-runs, task retries,
    * repartitioning, and INCREMENTAL growth (a doc added tomorrow lands in
    * the same split it would have today — no resplit churn for the
    * eval-contamination ledger), and SQL-replayable (q76). Fractions must
    * sum to ≤ 1; any remainder falls into the LAST label (so (train 0.8,
    * val 0.1, test 0.1) covers everything deterministically). Appends
    * `split`. One projection — scan-speed, no shuffle. */
  def hashSplit(df: DataFrame, key: Column,
                fractions: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0) &&
      fractions.map(_._2).sum <= 1.0 + 1e-9, "need fractions >= 0 summing <= 1")
    val u = portableUniform(key, salt)
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val split = fractions.zip(cuts).init.foldRight(
        lit(fractions.last._1): Column) { case (((name, _), cut), acc) =>
      when(u < lit(cut), lit(name)).otherwise(acc)
    }
    df.withColumn("split", split)
  }
}
