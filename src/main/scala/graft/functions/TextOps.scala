package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, shingling, quality scoring, language ID, fingerprinting.
  * All builtin Catalyst expressions (regex / array HOFs / hash builtins) —
  * codegen'd, no UDFs, so a 100 TB `documents` scan stays one
  * WholeStageCodegen pass.
  */
object TextOps {

  /** Whitespace tokens of the trimmed text (empty text → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: letter runs, digits, and single punctuation
    * marks each count as one token — a cheap deterministic proxy for a BPE
    * tokenizer's pre-tokenization pass. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Lowercased letters-and-digits-only normalization used for exact-dup
    * fingerprints. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  // --- PII redaction --------------------------------------------------

  /** Conservative PII patterns (kept to syntax both Java regex and RE2
    * accept identically, so the q72 oracle replays them verbatim):
    * email, dotted-quad IPv4, international-ish phone (7+ digits with
    * optional separators). Order matters — emails first so local-part
    * digits aren't half-eaten, and ipv4 BEFORE phone because a dotted
    * quad is digits-and-dots and the phone rule would swallow it. */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}"),
    ("phone", "\\+?[0-9][0-9()\\-. ]{5,}[0-9]"))

  /** Mask every PII match with `<TYPE>` tokens — the standard
    * corpus-curation scrub, as pure `regexp_replace` chains (codegen'd,
    * one projection, no UDF). Idempotent: the replacement tokens match
    * none of the patterns. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (name, p)) =>
      regexp_replace(c, p, s"<${name.toUpperCase}>")
    }

  /** Per-type PII match counts as a struct column (email, phone, ipv4) —
    * the audit side of [[redactPii]]: counts come from the SAME patterns
    * applied in the SAME order to the progressively redacted text, so
    * `sum(counts) == 0` after a second pass is the idempotence check. */
  def piiCounts(text: Column): Column = {
    val (structFields, _) = piiPatterns.foldLeft(
      (Seq.empty[Column], text)) { case ((acc, t), (name, p)) =>
      (acc :+ size(regexp_extract_all(t, lit(p), lit(0))).cast("long").as(name),
        regexp_replace(t, p, s"<${name.toUpperCase}>"))
    }
    struct(structFields: _*)
  }

  /** Character n-grams of the normalized text (deduplicated set). */
  def charNGrams(text: Column, n: Int): Column = {
    val t = normalized(text)
    array_distinct(
      when(length(t) < n, array(t))
        .otherwise(transform(sequence(lit(0), length(t) - n),
          i => substr(t, i + 1, lit(n)))))
  }

  /** Character n-grams as 64-bit hashes (deduplicated). Set operations over
    * long arrays are ~an order of magnitude cheaper than over UTF8 strings,
    * and 64-bit collisions are negligible (~n^2/2^65 per doc), so
    * intersection counts match the string-set counts exactly in practice. */
  def charNGramsHashed(text: Column, n: Int): Column =
    charNGramsHashedFromNormalized(normalized(text), n)

  /** [[charNGramsHashed]] over ALREADY-NORMALIZED text — a native one-pass
    * expression ([[VectorExprs.hashedCharNGrams]]): the HOF formulation it
    * replaces dispatched an interpreted `xxhash64(substr(...))` expression
    * tree per gram (~1700 per document). Output is sorted-distinct hashes,
    * ready for the two-pointer SortedLongIntersectSize; values are
    * identical to the HOF form (same substring semantics, same seed). */
  def charNGramsHashedFromNormalized(t: Column, n: Int): Column =
    VectorExprs.hashedCharNGrams(t, n)

  /** Word w-shingles: joined runs of w consecutive tokens (dedup'd). */
  def wordShingles(text: Column, w: Int): Column =
    wordShinglesFromTokens(tokens(text), w)

  /** [[wordShingles]] over a PRE-MATERIALIZED token array column (see
    * [[charNGramsHashedFromNormalized]] for why bulk callers must split
    * text → tokens in a separate projection). */
  def wordShinglesFromTokens(toks: Column, w: Int): Column =
    array_distinct(
      when(size(toks) < w, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - w),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(w))))))

  // --- quality scoring -----------------------------------------------------

  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("double") / n)
  }

  def digitRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, "[0-9]", ""))).cast("double") / n)
  }

  def upperRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(text, "[A-Z]", ""))).cast("double") / n)
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are", "from")

  /** Fraction of tokens that are (lowercased) stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(lower(text))
    val sw = lit(stopwords.toArray)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** One-pass token statistics over `tokens(lower(text))` — the codegen'd
    * fast path for bulk corpus-quality scans ([[graft.functions.TokenStats]]
    * replaces the interpreted `filter`/`aggregate` HOF lambdas of
    * [[stopwordRatio]]/[[meanTokenLength]]). Returns
    * `struct<n_tokens, sum_len, stop_hits>`; token count and lengths match
    * the unlowered forms on any cased text (lower() preserves codepoint
    * counts for the fixture's scripts), and the DuckDB oracles already
    * measure lengths on lowered tokens. */
  def tokenStatsOf(text: Column,
                   stopwords: Seq[String] = EnglishStopwords): Column =
    graft.functions.VectorExprs.tokenStats(tokens(lower(text)), stopwords)

  /** Composite [0,1] quality score: rewards stopword presence and sane token
    * lengths, penalizes punctuation/digit soup and very short docs. A
    * heuristic in the spirit of C4/Gopher-style filters, as a single
    * codegen'd expression. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 20.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 3.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 3.0)
    val digitPenalty = greatest(lit(0.0), lit(1.0) - digitRatio(text) * 2.0)
    val tokLen = meanTokenLength(text)
    val tokLenScore = when(tokLen >= 3 && tokLen <= 10, 1.0)
      .when(tokLen === 0, 0.0).otherwise(0.5)
    round(lenScore * 0.25 + swScore * 0.25 + punctPenalty * 0.2 +
      digitPenalty * 0.1 + tokLenScore * 0.2, 6)
  }

  // --- language identification --------------------------------------------

  /** Tiny per-language marker lexicons (top function words). Public-knowledge
    * lists; enough to separate the fixture languages. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den", "von", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "du", "que", "pas", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "en", "que", "una", "por", "con", "para"),
    "it" -> Seq("il", "la", "che", "di", "e", "un", "una", "per", "non", "sono", "con", "del"))

  /** Heuristic language ID: count marker-word hits per language over the
    * lowercased tokens, pick the argmax (ties → lexicographic language code,
    * no hits → "und"). Pure expression: one `array_max` over per-language
    * structs — Spark orders structs field-by-field, so (hits, revLang) max
    * picks highest hits then smallest code. */
  def langId(text: Column, markers: Map[String, Seq[String]] = LangMarkers): Column =
    langIdCjkAware(text, tokens(lower(text)), markers)

  /** CJK-aware language ID. CJK scripts don't whitespace-tokenize, so the
    * marker-word argmax can never see them; a codepoint-class ratio branch
    * runs first: if ≥30% of characters are Han/Kana/Hangul, classify by
    * script (kana ≥5% → ja, since Japanese mixes Han+Kana; else Hangul vs
    * Han majority → ko / zh). Otherwise fall through to the marker argmax.
    * Counts are length-differences after class removal — the same regex
    * shape the quality ratios use, so the DuckDB oracle mirrors it. */
  def langIdCjkAware(text: Column, toks: Column,
                     markers: Map[String, Seq[String]] = LangMarkers): Column = {
    val n = length(text)
    // ranges: Han 一-鿿, Kana ぀-ヿ, Hangul 가-힣
    val nHan = n - length(regexp_replace(text, "[一-鿿]", ""))
    val nKana = n - length(regexp_replace(text, "[぀-ヿ]", ""))
    val nHangul = n - length(regexp_replace(text, "[가-힣]", ""))
    val cjkTotal = nHan + nKana + nHangul
    when(n > 0 && cjkTotal * 10 >= n * 3,
      when(nKana * 20 >= n, lit("ja"))
        .when(nHangul > nHan, lit("ko"))
        .otherwise(lit("zh")))
      .otherwise(langIdFromTokens(toks, markers))
  }

  /** [[langId]] over a PRE-MATERIALIZED lowercased token array (bulk callers
    * should project the tokens first — the split would otherwise re-run once
    * per language inside the interpreted filter lambdas). */
  def langIdFromTokens(toks: Column, markers: Map[String, Seq[String]] = LangMarkers): Column = {
    val sorted = markers.toSeq.sortBy(_._1)
    val scored = sorted.zipWithIndex.map { case ((langCode, words), idx) =>
      val hits = size(filter(toks, t => array_contains(lit(words.toArray), t)))
      // rk: earlier lexicographic code wins ties under max
      struct(hits.as("hits"), lit(sorted.size - idx).as("rk"), lit(langCode).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // --- fingerprinting ------------------------------------------------------

  /** Content fingerprint: 64-bit xxhash of the normalized text. */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  /** MD5 fingerprint of normalized text (hex string) — used for the DuckDB
    * oracle since both engines implement the same MD5 over UTF-8 bytes. */
  def fingerprintMd5(text: Column): Column = md5(normalized(text).cast("binary"))

  /** THE engine-portable uniform in [0, 1): top 52 bits of md5(key) as a
    * double mantissa — exact in a double, identical in any engine with md5
    * (the division by 2^52 is a mantissa shift). `key` is a string column;
    * every deterministic-sampling site (E–S weighted sampling, mixture
    * draws, the BDQA trace) MUST route through this single definition so
    * the construction can never drift from the DuckDB oracles' replay. */
  def portableUniform52(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0)

  /** Polynomial rolling hash over normalized characters
    * (h = h*31 + code mod 2^61-1) — an order-sensitive document fingerprint
    * computed with array HOFs only. */
  def rollingHash(text: Column): Column = {
    val codes = transform(split(normalized(text), ""), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => pmod(acc * 31 + c, lit(2305843009213693951L)))
  }
}
