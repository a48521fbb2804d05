package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the CCNet-style quality signal: train a
  * smoothed bigram LM on a trusted reference slice of the corpus (e.g. the
  * language-ID'd high-confidence subset), then score every document by its
  * per-token cross-entropy under that model. Low cross-entropy ≈ fluent,
  * in-distribution text; high ≈ boilerplate, gibberish, or wrong-language —
  * the standard perplexity-bucket filter for pretraining corpora
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data", 2020 — public method; implementation here is an
  * add-one bigram LM rather than KenLM, chosen for exact oracle
  * replayability).
  *
  * Model (Laplace / add-one smoothing, V = reference vocabulary size):
  * {{{
  *   p_uni(w)      = (c(w) + 1) / (T + V)          T = reference token count
  *   p_bi(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)  unseen w1 → 1 / V-ish mass
  *   H(doc) = -(ln p_uni(w_1) + Σ_{i≥2} ln p_bi(w_i | w_{i-1})) / n
  * }}}
  *
  * 100 TB shape: two corpus scans (one to count, one to score) and
  * token-keyed shuffles only — the unigram/bigram count tables hold the
  * REFERENCE VOCABULARY, not the corpus, so for natural-language vocab
  * sizes AQE broadcasts them and scoring is scan-speed; at worst they
  * sort-merge join on 1–2 string keys. Totals (T, V) ride a broadcast
  * cross join, never a driver collect. Document text is exploded to
  * tokens exactly once per scan; no UDFs — `element_at`/`sequence`
  * projections keep the whole pipeline in codegen.
  */
object LangModel {

  /** Per-document cross-entropy under an add-one bigram LM trained on the
    * `isRef` rows. Output: (doc_id, n_tokens, ce) — empty-token documents
    * emit nothing (no tokens ⇒ no entropy to measure); `ce` rounded to 6
    * decimals for engine-portable comparison. */
  def bigramCrossEntropy(df: DataFrame, id: Column, toks: Column,
                         isRef: Column): DataFrame = {
    val base = df.select(id.cast("long").as("doc_id"), toks.as("__toks"),
      isRef.cast("boolean").as("__ref"))

    // --- train: reference counts -------------------------------------
    val refToks = base.filter(col("__ref"))
      .select(explode(col("__toks")).as("w"))
    val uni = refToks.groupBy("w").agg(count(lit(1)).as("cu"))
    val totals = uni.agg(sum("cu").cast("double").as("t"),
      count(lit(1)).cast("double").as("v"))

    val refBi = base.filter(col("__ref") && size(col("__toks")) >= 2)
      .select(col("__toks"),
        explode(sequence(lit(2), size(col("__toks")))).as("i"))
      .select(element_at(col("__toks"), col("i") - 1).as("w1"),
        element_at(col("__toks"), col("i")).as("w2"))
    val bi = refBi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))

    // --- score: every non-empty document ------------------------------
    val scored = base.filter(size(col("__toks")) >= 1)
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n_tokens"),
        col("__toks"))

    // first token under the unigram model
    val first = scored
      .select(col("doc_id"), element_at(col("__toks"), 1).as("w"))
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (-log((coalesce(col("cu"), lit(0L)).cast("double") + 1.0) /
          (col("t") + col("v")))).as("__h1"))

    // tokens 2..n under the bigram model, conditioned on their predecessor
    val rest = scored.filter(col("n_tokens") >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(2), size(col("__toks")))).as("i"), col("__toks"))
      .select(col("doc_id"),
        element_at(col("__toks"), col("i") - 1).as("w1"),
        element_at(col("__toks"), col("i")).as("w2"))
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cu", "cu1"),
        Seq("w1"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (-log((coalesce(col("cb"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("cu1"), lit(0L)).cast("double") + col("v")))).as("__h"))
      .groupBy("doc_id").agg(sum("__h").as("__hrest"))

    scored.select(col("doc_id"), col("n_tokens"))
      .join(first, Seq("doc_id"))
      .join(rest, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round((col("__h1") + coalesce(col("__hrest"), lit(0.0))) /
          col("n_tokens").cast("double"), 6).as("ce"))
  }
}
