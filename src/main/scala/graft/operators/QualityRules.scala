package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorExprs}

/** Corpus-curation rule gates in the Gopher/C4 style (Rae et al. 2021,
  * "Scaling Language Models", table A1; Raffel et al. 2020 §2.2): cheap
  * per-document heuristics that LLM-data pipelines run over the whole
  * corpus before any model-based filtering. Two surfaces:
  *
  *   - [[gopherFlags]]: pure single-pass rule flags (word-count bounds,
  *     mean word length, stopword evidence, punctuation density) — one
  *     codegen'd projection over the scan, no shuffle, 100 TB-safe by
  *     construction.
  *   - [[repetitionStats]]: repetition ratios (top-word fraction, duplicate
  *     2-/3-gram fractions) — the "repetitious content" family of Gopher
  *     rules. Needs per-(doc, word) counts, so it aggregates twice on
  *     (doc_id, word) then doc_id: both shuffles are keyed by doc_id
  *     prefixes (map-side combinable, no skew beyond document length), and
  *     the n-gram fractions ride along as constant-per-doc projections
  *     computed BEFORE the explode — no join needed.
  */
object QualityRules {

  /** Per-document rule flags, 1/0 BIGINTs (checker-hashable, SQL-mirrorable):
    *   - `w_ok`: word count in [minWords, maxWords]
    *   - `mwl_ok`: mean word length in [minMeanLen, maxMeanLen]
    *   - `stop_ok`: at least `minStopHits` stopword occurrences
    *   - `punct_ok`: punctuation ratio ≤ maxPunct
    *   - `pass`: conjunction of the four.
    * Defaults follow the published Gopher thresholds where the fixture can
    * exercise them (50–100k words, mean length 3–10, ≥2 stopword hits). */
  def gopherFlags(df: DataFrame, id: Column, text: Column,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minStopHits: Int = 2, maxPunct: Double = 0.1): DataFrame = {
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    // TokenStats = one codegen'd pass for count/length/stopword aggregates
    // (its own projection so it evaluates once, not once per field)
    df.select(id.cast("long").as("doc_id"), text.as("__text"),
        TextOps.tokenStatsOf(text).as("__ts"))
      .select(col("doc_id"),
        col("__ts.n_tokens").as("__nw"),
        when(col("__ts.n_tokens") === 0, 0.0)
          .otherwise(col("__ts.sum_len").cast("double") /
            col("__ts.n_tokens").cast("double")).as("__mwl"),
        col("__ts.stop_hits").as("__stop"),
        TextOps.punctRatio(col("__text")).as("__punct"))
      .select(col("doc_id"),
        flag(col("__nw").between(minWords, maxWords)).as("w_ok"),
        flag(col("__mwl").between(minMeanLen, maxMeanLen)).as("mwl_ok"),
        flag(col("__stop") >= minStopHits).as("stop_ok"),
        flag(col("__punct") <= maxPunct).as("punct_ok"))
      .withColumn("pass",
        col("w_ok") * col("mwl_ok") * col("stop_ok") * col("punct_ok"))
  }

  /** Repetition ratios per document (empty-token docs are dropped):
    *   - `top_word_frac`: occurrences of the most frequent word / total words
    *   - `dup_2gram_frac`, `dup_3gram_frac`: 1 − distinct/total n-grams
    *     (0 when the doc has fewer than n words).
    * The n-gram distinct counts use the native sorted-distinct xxhash64
    * shingle expression (collision odds ~n²/2⁶⁵ — the q43 precedent), so
    * they stay a pure projection; only the word counts aggregate. */
  def repetitionStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df.select(id.cast("long").as("doc_id"),
        TextOps.tokens(text).as("__toks"))
      .filter(size(col("__toks")) > 0)
    def dupFrac(n: Int): Column =
      when(size(col("__toks")) < n, 0.0).otherwise(
        lit(1.0) -
          size(VectorExprs.hashedWordShingles(col("__toks"), n)).cast("double") /
          (size(col("__toks")) - (n - 1)).cast("double"))
    // Two selects, NOT one: with the dup fractions inlined next to the
    // explode, the planner puts that projection ABOVE the Generate and the
    // O(n) shingle expression runs once per exploded WORD (O(n²) per doc).
    // A separate projection below the Generate evaluates them once per doc.
    val withFracs = base.select(col("doc_id"),
      dupFrac(2).as("__d2"), dupFrac(3).as("__d3"), col("__toks"))
    val exploded = withFracs.select(col("doc_id"), col("__d2"), col("__d3"),
      explode(col("__toks")).as("__w"))
    exploded
      .groupBy("doc_id", "__w")
      .agg(count(lit(1)).as("__c"), first("__d2").as("__d2"), first("__d3").as("__d3"))
      .groupBy("doc_id")
      .agg((max("__c").cast("double") / sum("__c").cast("double")).as("__twf"),
        first("__d2").as("__d2"), first("__d3").as("__d3"))
      .select(col("doc_id"),
        round(col("__twf"), 6).as("top_word_frac"),
        round(col("__d2"), 6).as("dup_2gram_frac"),
        round(col("__d3"), 6).as("dup_3gram_frac"))
  }

  /** Token-distribution entropy signals (the information-theoretic slice of
    * quality filtering — low-entropy docs are boilerplate/keyword-stuffing;
    * near-zero normalized entropy plus high length is the classic SEO-spam
    * shape):
    *  - `entropy`: Shannon entropy −Σ (c/n)·ln(c/n) of the doc's unigram
    *    distribution (nats),
    *  - `norm_entropy`: entropy / ln(n_distinct) ∈ [0,1] (0 when the doc
    *    has ≤1 distinct token),
    *  - `distinct_frac`: type-token ratio n_distinct / n_tokens.
    *
    * Scale shape: explode → two partial-aggregatable groupBys, all keyed by
    * doc — shuffle volume is O(tokens) then O(distinct tokens); nothing
    * driver-side, no window, no per-doc quadratic work. Empty docs emit
    * zeros. */
  def entropyStats(df: DataFrame, id: Column, toks: Column): DataFrame = {
    val base = df.select(id.cast("long").as("doc_id"), toks.as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
    val p = col("__c") / col("n_tokens").cast("double")
    val per = base.filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), explode(col("__toks")).as("__w"))
      .groupBy("doc_id", "n_tokens", "__w")
      .agg(count(lit(1)).cast("double").as("__c"))
      .groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_distinct"),
        sum(-p * log(p)).as("__H"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(per.drop("n_tokens"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_distinct"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(coalesce(col("__H"), lit(0.0)), 6).as("entropy"),
        round(when(col("n_distinct") > 1,
          coalesce(col("__H"), lit(0.0)) / log(col("n_distinct").cast("double")))
          .otherwise(lit(0.0)), 6).as("norm_entropy"),
        round(when(col("n_tokens") > 0,
          col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)), 6).as("distinct_frac"))
  }

  /** C4-style LINE-level filtering (Raffel et al. 2020, public — the
    * sub-document pass the whole-document gates above cannot express):
    * keep a line iff it ends in terminal punctuation (`.`/`!`/`?`/`"`
    * after right-trim), holds at least `minWords` whitespace words, and
    * contains no banned substring (case-insensitive); reassemble the
    * survivors with `\n`. Pure codegen HOFs over the split-line array —
    * no regex beyond the whitespace split, so the DuckDB replay (q116)
    * is expression-for-expression. Output per doc:
    * (doc_id, n_lines, n_kept, text_clean). Scan-speed; no shuffle. */
  def c4LineFilter(df: DataFrame, id: Column, text: Column,
                   minWords: Int = 3,
                   banned: Seq[String] = Seq("javascript")): DataFrame = {
    require(minWords >= 1, "minWords must be positive")
    val lines = split(coalesce(text, lit("")), "\n")
    def keepLine(l: Column): Column = {
      val terminal = substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"")
      val words = size(split(trim(l), "\\s+")) >= minWords
      val clean = banned.map(b => !contains(lower(l), lit(b.toLowerCase)))
        .reduceOption(_ && _).getOrElse(lit(true))
      terminal && words && clean
    }
    df.select(id.cast("long").as("doc_id"), lines.as("__lines"))
      .select(col("doc_id"),
        size(col("__lines")).cast("long").as("n_lines"),
        filter(col("__lines"), keepLine _).as("__kept"))
      .select(col("doc_id"), col("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), "\n").as("text_clean"))
  }
}
