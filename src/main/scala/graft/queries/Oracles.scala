package graft.queries

/** DuckDB oracle SQL for every SQL-expressible query in [[Queries]].
  * Each statement runs against views named after the parquet fixtures and
  * must produce the SAME column names and the SAME values (after the
  * rounding baked into both sides) as the Spark query. Arithmetic mirrors
  * the Spark expression trees operation-for-operation so doubles agree
  * bit-for-bit before rounding.
  */
object Oracles {

  /** SQL IN-list literal for a rule table (PSL entries are bare ASCII
    * hostname labels — no quoting hazards). */
  private def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString(", ")

  val q01 = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val q02 = """
    SELECT round(avg(l_discount * l_discount), 8) AS mse_rel,
           round(avg(abs(l_discount)), 8) AS mae_rel,
           round(var_pop(l_quantity), 4) AS var_pop_qty,
           round(avg(l_quantity), 6) AS mean_qty
    FROM lineitem"""

  val q03 = """
    WITH s AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
                      count(*) AS n FROM lineitem)
    SELECT CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 32.0)), 31.0) AS BIGINT) AS bucket,
           count(*) AS cnt,
           round(count(*)::DOUBLE / any_value(n) / any_value((mx - mn) / 32.0), 8) AS density
    FROM lineitem, s
    GROUP BY 1 ORDER BY 1"""

  val q04 = """
    SELECT round(sum(seg), 4) AS integral FROM (
      SELECT (value + lag(value) OVER (ORDER BY event_id)) / 2.0
             * (event_id - lag(event_id) OVER (ORDER BY event_id)) AS seg
      FROM events)"""

  val q05 = """
    SELECT o_orderkey,
           round(CASE WHEN max(o_totalprice) OVER () = min(o_totalprice) OVER () THEN 0.0
                 ELSE (o_totalprice - min(o_totalprice) OVER ())
                      / (max(o_totalprice) OVER () - min(o_totalprice) OVER ()) END, 6) AS scaled
    FROM orders ORDER BY o_orderkey"""

  val q06 = """
    WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
    b AS (SELECT o_orderkey,
                 CAST(least(floor((o_totalprice - mn) / ((mx - mn) / 32.0)), 31.0) AS BIGINT) AS bucket
          FROM orders, s),
    r AS (SELECT o_orderkey, bucket,
                 1.0 / (count(*) OVER (PARTITION BY bucket)) AS raw
          FROM b)
    SELECT o_orderkey, bucket, round(raw / sum(raw) OVER (), 8) AS w
    FROM r ORDER BY o_orderkey"""

  val q07 = """
    SELECT l_quantity, l_orderkey, l_linenumber FROM (
      SELECT l_quantity, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_quantity ORDER BY l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_quantity) AS cnt
      FROM lineitem)
    WHERE rn = floor(cnt / 2) + 1
    ORDER BY l_quantity"""

  val q08 = """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20"""

  val q09 = """
    WITH top AS (SELECT l_orderkey, l_linenumber FROM lineitem
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100)
    SELECT count(*) AS n_remaining,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM top t
                      WHERE t.l_orderkey = l.l_orderkey
                        AND t.l_linenumber = l.l_linenumber)"""

  private val normText = "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')"

  val q10 = s"""
    SELECT md5($normText) AS fp, min(doc_id) AS keep_id, count(*) AS dups
    FROM documents GROUP BY 1 ORDER BY 1"""

  val q11 = """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpeish
    FROM documents ORDER BY doc_id"""

  // Ratios mirror TextOps: count via length-difference after class removal.
  val q12 = """
    WITH t AS (
      SELECT doc_id, text, length(text) AS n,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
      FROM documents)
    SELECT doc_id,
           round(CASE WHEN n = 0 THEN 0.0 ELSE
             (n - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))::DOUBLE / n END, 6) AS punct_ratio,
           round(CASE WHEN n = 0 THEN 0.0 ELSE
             (n - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / n END, 6) AS digit_ratio,
           round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this','are','from'], x)))::DOUBLE
             / len(toks) END, 6) AS stopword_ratio,
           round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END, 6) AS mean_tok_len
    FROM t ORDER BY doc_id"""

  val q14 = s"""
    SELECT doc_id, md5($normText) AS fp_md5
    FROM documents ORDER BY doc_id"""

  // Language-ID: CJK codepoint-ratio branch + marker-word argmax, generated
  // from the SAME TextOps.LangMarkers lexicons so both sides stay in sync.
  // Tie order mirrors Spark's struct-max: highest hits, then lexicographically
  // smallest language code (the CASE checks codes in sorted order).
  val q13: String = {
    val toksLower = """CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      ELSE regexp_split_to_array(trim(lower(text)), '\s+') END"""
    val langs = graft.functions.TextOps.LangMarkers.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (code, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, t -> list_contains($list, t))) AS h_$code"
    }.mkString(", ")
    val gExpr = langs.map { case (code, _) => s"h_$code" }.mkString("greatest(", ", ", ")")
    val caseArms = langs.map { case (code, _) => s"WHEN h_$code = g THEN '$code'" }.mkString(" ")
    s"""
    WITH t AS (
      SELECT $toksLower AS toks, length(text) AS n,
             length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS n_han,
             length(text) - length(regexp_replace(text, '[぀-ヿ]', '', 'g')) AS n_kana,
             length(text) - length(regexp_replace(text, '[가-힣]', '', 'g')) AS n_hang
      FROM documents),
    h AS (SELECT n, n_han, n_kana, n_hang, $hitCols FROM t),
    s AS (SELECT *, $gExpr AS g FROM h),
    pred AS (
      SELECT CASE
               WHEN n > 0 AND (n_han + n_kana + n_hang) * 10 >= n * 3 THEN
                 CASE WHEN n_kana * 20 >= n THEN 'ja'
                      WHEN n_hang > n_han THEN 'ko'
                      ELSE 'zh' END
               WHEN g = 0 THEN 'und'
               $caseArms
             END AS lang_pred
      FROM s)
    SELECT lang_pred, count(*) AS n FROM pred GROUP BY lang_pred ORDER BY lang_pred"""
  }

  private val ngrams3 = s"""
    CASE WHEN length($normText) < 3 THEN [$normText]
         ELSE list_distinct(list_transform(generate_series(1, length($normText) - 2),
                i -> substring($normText, i, 3))) END"""

  val q15 = s"""
    WITH g AS (SELECT doc_id, lang, source, $ngrams3 AS g FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) = 0 THEN 0.0
                   ELSE len(list_intersect(a.g, b.g))::DOUBLE
                        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))::DOUBLE END, 6) AS jaccard
      FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, jaccard FROM pairs
    WHERE jaccard >= 0.5
    ORDER BY id_a, id_b"""

  // dot/norms as ordered left-folds so doubles match Spark's aggregate() HOF.
  // Length-driven (len(a), not a literal dim) so the oracle tracks the
  // fixture's actual embedding dimension.
  private def dotD(a: String, b: String) =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"
  private def normSqD(a: String) =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)), (x, y) -> x + y)"
  private def cosineD(a: String, b: String) =
    s"""(CASE WHEN sqrt(${normSqD(a)}) * sqrt(${normSqD(b)}) > 0
         THEN ${dotD(a, b)} / (sqrt(${normSqD(a)}) * sqrt(${normSqD(b)})) ELSE 0.0 END)"""

  val q16 = s"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(${cosineD("c.embedding", "q.embedding")}, 6) AS score
      FROM embeddings c, embeddings q WHERE q.vec_id < 8),
    ranked AS (
      SELECT query_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank",
             neighbor_id, score
      FROM scored)
    SELECT query_id, "rank", neighbor_id, score FROM ranked
    WHERE "rank" <= 10
    ORDER BY query_id, "rank""""

  val q17 = s"""
    WITH pairs AS (
      SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
             round(${cosineD("a.embedding", "b.embedding")}, 6) AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE a.vec_id % 10 = 0)
    SELECT label, id_a, id_b, cosine FROM pairs
    WHERE cosine >= 0.4
    ORDER BY id_a, id_b"""

  val q18 = """
    SELECT event_type, count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type ORDER BY event_type"""

  val q19 = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1 ORDER BY 1"""

  val q20 = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name"""

  private def profileCol(c: String) = s"""
    SELECT '$c' AS col_name, count(*) AS n_rows,
           count(*) - count($c) AS n_nulls,
           round((count(*) - count($c))::DOUBLE / count(*), 6) AS null_rate,
           count(DISTINCT $c) AS n_distinct,
           CAST(min($c) AS VARCHAR) AS min_value,
           CAST(max($c) AS VARCHAR) AS max_value
    FROM orders"""

  val q21 = Seq("o_custkey", "o_orderstatus", "o_orderpriority")
    .map(profileCol).mkString("", " UNION ALL ", " ORDER BY col_name")

  private def ruleSql(name: String, pred: String) = s"""
    SELECT '$name' AS rule,
           count(CASE WHEN NOT coalesce($pred, false) THEN 1 END) AS violations,
           count(*) AS n_rows,
           round(count(CASE WHEN NOT coalesce($pred, false) THEN 1 END)::DOUBLE / count(*), 6) AS violation_rate
    FROM lineitem"""

  val q22 = Seq(
    ruleSql("range_l_quantity", "l_quantity IS NOT NULL AND l_quantity >= 1 AND l_quantity <= 50"),
    ruleSql("non_negative_l_extendedprice", "l_extendedprice IS NOT NULL AND l_extendedprice >= 0"),
    ruleSql("range_l_discount", "l_discount IS NOT NULL AND l_discount >= 0.0 AND l_discount <= 0.1"),
    ruleSql("range_l_tax", "l_tax IS NOT NULL AND l_tax >= 0.0 AND l_tax <= 0.08"),
    ruleSql("not_null_l_shipdate", "l_shipdate IS NOT NULL")
  ).mkString("", " UNION ALL ", " ORDER BY rule")

  val q23 = """
    SELECT l_orderkey, count(*) AS dups FROM lineitem
    GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey"""

  // Sums as ordered left-folds over the window lists (not window SUMs) so
  // doubles match Spark's aggregate() over the featurizer's arrays exactly.
  val q24 = """
    WITH w AS (
      SELECT event_id AS win_id,
             list(value) OVER (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS hist,
             list(value) OVER (ORDER BY event_id ROWS BETWEEN 10 FOLLOWING AND 14 FOLLOWING) AS target
      FROM events)
    SELECT win_id,
           round(list_reduce(list_prepend(0.0, hist), (a, b) -> a + b), 4) AS hist_sum,
           round(list_reduce(list_prepend(0.0, target), (a, b) -> a + b), 4) AS target_sum
    FROM w
    WHERE len(hist) = 10 AND len(target) = 5
    ORDER BY win_id"""

  // Fixed-parameter KDE (lo=900, hi=105000, g=1024, bw=2000): replays
  // Kde.fitBinned exactly — linear binning (each row splits weight between
  // flanking grid points), normalize, Gaussian-convolve within the 8.5-sigma
  // support. Arithmetic mirrors the Scala loop operation-for-operation
  // (t = (j-i)*step/bw; term = (wsum/total)*knorm*exp(-0.5*(t*t))).
  val q25 = """
    WITH p AS (SELECT 900.0 AS lo, 105000.0 AS hi, 2000.0 AS bw,
                      (105000.0 - 900.0) / 1023 AS step,
                      1.0 / (2000.0 * sqrt(2.0 * pi())) AS knorm,
                      CAST(least(1024, ceil(8.5 * 2000.0 / ((105000.0 - 900.0) / 1023)) + 1) AS INTEGER) AS support),
    src AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem, p
            WHERE l_extendedprice IS NOT NULL
              AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
              AND CAST(l_extendedprice AS DOUBLE) >= p.lo
              AND CAST(l_extendedprice AS DOUBLE) <= p.hi),
    ps AS (SELECT (v - lo) / step AS pos,
                  least(greatest(CAST(floor((v - lo) / step) AS INTEGER), 0), 1023) AS i0
           FROM src, p),
    fr AS (SELECT i0, least(greatest(pos - CAST(i0 AS DOUBLE), 0.0), 1.0) AS frac FROM ps),
    pairs AS (
      SELECT i0 AS bin, 1.0 * (1.0 - frac) AS w FROM fr
      UNION ALL
      SELECT least(i0 + 1, 1023) AS bin, 1.0 * frac AS w FROM fr),
    bins AS (SELECT bin, sum(w) AS wsum FROM pairs GROUP BY bin),
    tot AS (SELECT sum(wsum) AS total FROM bins),
    terms AS (
      SELECT j.j AS j, b.wsum, t.total, p.knorm,
             (j.j - b.bin) * p.step / p.bw AS tt
      FROM generate_series(0, 1023) j(j)
      CROSS JOIN bins b CROSS JOIN tot t CROSS JOIN p
      WHERE b.wsum > 0 AND abs(j.j - b.bin) <= p.support),
    conv AS (
      SELECT j, sum((wsum / total) * knorm * exp(-0.5 * (tt * tt))) AS pdf
      FROM terms GROUP BY j)
    SELECT round(p.lo + g.g * p.step, 6) AS grid_x,
           round(coalesce(c.pdf, 0.0), 10) AS pdf
    FROM generate_series(0, 1023) g(g)
    CROSS JOIN p
    LEFT JOIN conv c ON c.j = g.g
    ORDER BY g.g"""

  // Hash-deterministic Efraimidis-Spirakis informative sample: u is the
  // first 13 md5 hex digits of the row key as a 52-bit integer (exact in a
  // double; the digit fold sums exact integers so fold order is irrelevant),
  // weights are inverse histogram-bucket counts, ranking key cnt*ln(u).
  val q26 = """
    WITH s AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem),
    b AS (SELECT l_orderkey, l_linenumber, l_extendedprice,
                 CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 32.0)), 31.0) AS BIGINT) AS bucket
          FROM lineitem, s),
    c AS (SELECT *, count(*) OVER (PARTITION BY bucket) AS cnt FROM b),
    h AS (SELECT *, substr(md5(concat_ws('|', l_orderkey, l_linenumber)), 1, 13) AS hx FROM c),
    u AS (SELECT *, list_reduce(list_prepend(0.0,
              list_transform(generate_series(1, 13),
                k -> CAST(strpos('0123456789abcdef', substr(hx, k, 1)) - 1 AS DOUBLE)
                     * pow(16.0, 13 - k))),
            (a, x) -> a + x) / 4503599627370496.0 AS u
          FROM h),
    scored AS (SELECT *, CAST(cnt AS DOUBLE) * ln(u) AS es_key FROM u)
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS l_extendedprice,
           bucket, round(es_key, 6) AS es_key
    FROM scored
    ORDER BY es_key DESC, l_orderkey, l_linenumber
    LIMIT 100"""

  // MinHash near-dup pairs: the oracle is the EXACT all-pairs word-3-shingle
  // Jaccard >= 0.5 set. Equality holds because banded LSH (16 bands x 4
  // rows) catches every fixture pair at these similarities — verified per
  // scale factor; a genuinely borderline pair (j ~ 0.5) could be missed by
  // LSH with p ~ 0.36, which would surface as a red row, not silently.
  val q28 = """
    WITH t AS (SELECT doc_id,
                      CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                      ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh
          FROM t),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh)) AS inter, len(a.sh) AS na, len(b.sh) AS nb
      FROM g a JOIN g b ON a.doc_id < b.doc_id),
    j AS (SELECT id_a, id_b,
                 round(CASE WHEN na + nb - inter = 0 THEN 0.0
                       ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) END, 6) AS jaccard
          FROM pairs)
    SELECT id_a, id_b, jaccard FROM j
    WHERE jaccard >= 0.5
    ORDER BY id_a, id_b"""

  // IVF recall gate: closed-form (q33 style) — the Spark side computes
  // recall@10 of IVF vs exact and emits the pass/fail plus the constants.
  val q30 = """
    SELECT CAST(1 AS BIGINT) AS recall_pass, CAST(8 AS BIGINT) AS n_queries,
           CAST(10 AS BIGINT) AS k"""

  // Exact ANN via TopKAggregator: ranked on RAW score (aggregator compares
  // unrounded doubles with smaller-id tie-break), rounded only for output.
  val q31 = s"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${cosineD("c.embedding", "q.embedding")} AS score
      FROM embeddings c, embeddings q WHERE q.vec_id < 8),
    ranked AS (
      SELECT query_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank",
             neighbor_id, round(score, 6) AS score
      FROM scored)
    SELECT query_id, "rank", neighbor_id, score FROM ranked
    WHERE "rank" <= 10
    ORDER BY query_id, "rank""""

  // Sliding windows as position-weighted digests: the fold is an ordered
  // left-fold (list_prepend 0.0) so doubles agree with Spark's aggregate().
  val q27 = """
    WITH w AS (
      SELECT event_id AS win_id,
             list(value) OVER (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS hist,
             list(value) OVER (ORDER BY event_id ROWS BETWEEN 10 FOLLOWING AND 14 FOLLOWING) AS target
      FROM events)
    SELECT win_id,
           round(list_reduce(list_prepend(0.0, list_transform(generate_series(1, 10), i -> hist[i] * CAST(i AS DOUBLE))), (a, b) -> a + b), 4) AS hist_wsum,
           round(list_reduce(list_prepend(0.0, list_transform(generate_series(1, 5), i -> target[i] * CAST(i AS DOUBLE))), (a, b) -> a + b), 4) AS target_wsum,
           round(hist[1], 4) AS hist_first,
           round(hist[10], 4) AS hist_last,
           round(target[1], 4) AS target_first,
           round(target[5], 4) AS target_last
    FROM w
    WHERE len(hist) = 10 AND len(target) = 5
    ORDER BY win_id"""

  val q32 = """
    WITH g AS (
      SELECT a.i * 50 + b.i AS id,
             -1.0 + a.i * (2.0 / 49) AS x1,
             -1.0 + b.i * (2.0 / 49) AS x2
      FROM generate_series(0, 49) a(i), generate_series(0, 49) b(i))
    SELECT id, x1, x2,
           round(pow(x1, 3) - x1 + pow(x2, 2) + 0.5 * sin(8 * x1 * x2), 6) AS y
    FROM g ORDER BY id"""

  // LHS stratification is a structural guarantee: exactly one sample per
  // stratum per dimension, so the oracle is the closed-form answer.
  val q33 = """
    SELECT CAST(64 AS BIGINT) AS d1, CAST(64 AS BIGINT) AS d2,
           CAST(64 AS BIGINT) AS n"""

  // SimHash pairs, replayed from scratch: q29 runs in portable-hash mode
  // (token hash = first 8 bytes of md5, big-endian — exactly the integer
  // parsed from the first 16 hex digits of md5(token)), so the oracle can
  // rebuild every fingerprint bit-for-bit: per-token bit votes from the hex
  // digits (bit i lives in digit 16 - i//4 at in-nibble position i%4), sign
  // of each bit's total, then ALL-PAIRS hamming ≤ 7 — an exhaustive ground
  // truth that also proves the blocked pipeline's candidate recall is 1.0.
  val q29 = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(nt)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(nt), '\s+') END AS toks
      FROM (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS nt
            FROM documents)),
    tok AS (SELECT doc_id, md5(unnest(toks)) AS m FROM t WHERE len(toks) > 0),
    votes AS (
      SELECT doc_id, b.i,
             sum(CASE WHEN ((CAST(strpos('0123456789abcdef',
                              substring(m, 16 - b.i // 4, 1)) - 1 AS INT)
                             >> (b.i % 4)) & 1) = 1
                      THEN 1 ELSE -1 END) AS s
      FROM tok, generate_series(0, 63) b(i)
      GROUP BY doc_id, b.i),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN
                     CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                          ELSE CAST(CAST(1 AS BIGINT) << i AS HUGEINT) END
                   ELSE 0 END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 7
    ORDER BY id_a, id_b"""

  // PCA gate: the basis is sign/rotation ambiguous, but total variance
  // (trace of the covariance) is engine-checkable via the same var_samp
  // aggregates, to 4 significant digits; the eigen invariants (Σλ = trace,
  // orthonormality, per-component projection variance = λ·(n−1)/n against
  // the distributed data) are Spark-side 1/0 flags the oracle pins to 1.
  val q34 = """
    SELECT CAST(cnt AS BIGINT) AS n,
           CAST(round(t / pow(10, floor(log10(t)) - 3)) AS BIGINT) AS trace_sig4,
           CAST(1 AS BIGINT) AS eig_trace_ok,
           CAST(1 AS BIGINT) AS ortho_ok,
           CAST(1 AS BIGINT) AS pcvar_ok
    FROM (SELECT count(*) AS cnt,
                 var_samp(l_quantity) + var_samp(l_extendedprice)
                 + var_samp(l_discount) + var_samp(l_tax) AS t
          FROM lineitem)"""

  val q35 = """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (SELECT event_id AS p_event_id, user_id, ts AS p_ts, value AS p_value
                  FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, p.p_event_id AS purchase_event_id,
           round(p.p_value, 2) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.p_ts
    ORDER BY c.event_id"""

  val q36 = """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           epoch_us(CAST(min(ts) AS TIMESTAMP)) AS session_start,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""

  val q37 = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, coalesce(l_returnflag, ''), coalesce(l_linestatus, '')"""

  val q38 = """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
             dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
             ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
      FROM orders)
    SELECT o_custkey, o_orderkey, price, rn, rnk, drnk, price_quartile
    FROM ranked WHERE rn <= 3
    ORDER BY o_custkey, rn"""

  val q39 = """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50,
           round(quantile_cont(l_quantity, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  val q40 = """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey"""

  val q41 = """
    SELECT count(DISTINCT l_partkey) AS d_parts,
           count(DISTINCT l_suppkey) AS d_supps,
           count(DISTINCT (l_returnflag, l_linestatus)) AS d_flag_status,
           count(DISTINCT l_quantity) AS d_qty,
           count(*) AS n
    FROM lineitem"""

  // Deterministic stratified sample: same md5 cell-order on both engines.
  val q42 = """
    WITH t AS (SELECT lang, source, doc_id,
                      md5(concat_ws('|', lang, source, doc_id)) AS h
               FROM documents),
    r AS (SELECT lang, source, doc_id,
                 row_number() OVER (PARTITION BY lang, source ORDER BY h) AS rn,
                 count(*) OVER (PARTITION BY lang, source) AS n_cell
          FROM t)
    SELECT lang, source, doc_id FROM r
    WHERE rn <= ceil(n_cell * 0.1)
    ORDER BY lang, source, doc_id"""

  // Contamination: corpus docs sharing any word 5-shingle with the
  // benchmark set (doc_id < 10). String shingles here; the Spark side uses
  // xxhash64 of the same shingles (distinct counts agree — 64-bit
  // collisions are ~n²/2⁶⁵).
  val q43 = """
    WITH t AS (SELECT doc_id,
                      CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
                      ELSE list_distinct(list_transform(generate_series(1, len(toks) - 4),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) END AS sh
          FROM t),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE doc_id < 10),
    corpus AS (SELECT doc_id, unnest(sh) AS s FROM g WHERE doc_id >= 10)
    SELECT doc_id, count(DISTINCT s) AS n_shared
    FROM corpus WHERE s IN (SELECT s FROM bench)
    GROUP BY doc_id ORDER BY doc_id"""

  // Contamination fraction: q43's construction, left-joined back onto the
  // per-doc distinct-shingle counts so zero-overlap docs appear with 0.
  val q79 = """
    WITH t AS (SELECT doc_id,
                      CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
                      ELSE list_distinct(list_transform(generate_series(1, len(toks) - 4),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) END AS sh
          FROM t),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE doc_id < 10),
    corpus AS (SELECT doc_id, unnest(sh) AS s FROM g WHERE doc_id >= 10),
    m AS (SELECT doc_id, count(DISTINCT s) AS n_shared
          FROM corpus WHERE s IN (SELECT s FROM bench)
          GROUP BY doc_id)
    SELECT g.doc_id, CAST(len(g.sh) AS BIGINT) AS n_shingles,
           CAST(coalesce(m.n_shared, 0) AS BIGINT) AS n_shared,
           round(CAST(coalesce(m.n_shared, 0) AS DOUBLE) / CAST(len(g.sh) AS DOUBLE), 6) AS frac
    FROM g LEFT JOIN m ON m.doc_id = g.doc_id
    WHERE g.doc_id >= 10
    ORDER BY g.doc_id"""

  // Connected components over the q28 pair set (proven equal to the LSH
  // output): recursive label closure, then min label per doc. `pairs` is
  // the q28 oracle body minus its final ORDER BY.
  val q44: String = {
    val pairsBody = q28.trim.stripSuffix("ORDER BY id_a, id_b").trim
    s"""
    WITH RECURSIVE pr AS ($pairsBody),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pr
              UNION ALL SELECT id_b, id_a FROM pr),
    lbl(id, label) AS (
        SELECT doc_id, doc_id FROM documents
      UNION
        SELECT e.src, l.label FROM edges e JOIN lbl l ON l.id = e.dst
    )
    SELECT id AS doc_id, min(label) AS cluster_id
    FROM lbl GROUP BY id ORDER BY doc_id"""
  }

  // Gopher-rule flags: thresholds compare UNROUNDED ratios on both sides;
  // every ratio is an exact IEEE division of integer aggregates, so the
  // boundary decisions are bit-identical across engines.
  val q45 = """
    WITH t AS (
      SELECT doc_id, text, length(text) AS n,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
      FROM documents),
    f AS (
      SELECT doc_id, len(toks) AS nw,
             CASE WHEN len(toks) = 0 THEN 0.0 ELSE
               list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END AS mwl,
             len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this','are','from'], x))) AS stop_hits,
             CASE WHEN n = 0 THEN 0.0 ELSE
               (n - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))::DOUBLE / n END AS punct
      FROM t)
    SELECT doc_id,
           CAST(CASE WHEN nw BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS w_ok,
           CAST(CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS BIGINT) AS mwl_ok,
           CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS stop_ok,
           CAST(CASE WHEN punct <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS punct_ok,
           CAST(CASE WHEN nw BETWEEN 50 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
                      AND stop_hits >= 2 AND punct <= 0.1
                THEN 1 ELSE 0 END AS BIGINT) AS pass
    FROM f ORDER BY doc_id"""

  // Repetition ratios: the Spark side distinct-counts n-grams via sorted
  // xxhash64 shingles (collision odds ~n²/2⁶⁵ — q43 precedent); the oracle
  // distinct-counts the strings themselves. Word counts aggregate exactly.
  val q46 = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      FROM documents),
    nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
    w AS (SELECT doc_id, unnest(toks) AS w FROM nz),
    wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
    top AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS twf
            FROM wc GROUP BY doc_id),
    g AS (SELECT doc_id,
            CASE WHEN len(toks) < 2 THEN 0.0 ELSE
              1.0 - len(list_distinct(list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1])))::DOUBLE
                    / (len(toks) - 1)::DOUBLE END AS d2,
            CASE WHEN len(toks) < 3 THEN 0.0 ELSE
              1.0 - len(list_distinct(list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))::DOUBLE
                    / (len(toks) - 2)::DOUBLE END AS d3
          FROM nz)
    SELECT g.doc_id,
           round(twf, 6) AS top_word_frac,
           round(d2, 6) AS dup_2gram_frac,
           round(d3, 6) AS dup_3gram_frac
    FROM g JOIN top ON g.doc_id = top.doc_id
    ORDER BY g.doc_id"""

  // Range join: DuckDB's planner handles the BETWEEN predicate directly
  // (IEJoin); the Spark side gets the same rows from the bucketized cell
  // join. Window END is inclusive on both sides.
  val q47 = """
    WITH c AS (SELECT event_id AS click_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS p
               FROM events WHERE event_type = 'click'),
    pu AS (SELECT event_id AS purchase_id, user_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS s
           FROM events WHERE event_type = 'purchase')
    SELECT c.click_id, pu.purchase_id, c.user_id, c.p - pu.s AS dt_us
    FROM c JOIN pu
      ON c.user_id = pu.user_id AND c.p BETWEEN pu.s AND pu.s + 1800000000
    ORDER BY c.click_id, pu.purchase_id"""

  // Sketch gates: exact distinct counts anchor the hash check; the HLL and
  // t-digest error flags are Spark-side (the sketches themselves are not
  // portable across engines, their errors vs exact are).
  val q48 = """
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orderkeys,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_partkeys,
           CAST(1 AS BIGINT) AS hll_ok,
           CAST(1 AS BIGINT) AS pctl_ok
    FROM lineitem"""

  // Interpolation join: prev knot via backward ASOF, next knot via forward
  // ASOF (both inclusive on ties, matching the Spark window frames), then
  // the SAME lerp arithmetic op-for-op. Probes on a knot take the zero-
  // distance branch on both sides.
  val q49 = """
    WITH c AS (SELECT event_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP))::DOUBLE AS x
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP))::DOUBLE AS kx,
                 avg(value) AS ky
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    prev AS (SELECT c.event_id, c.user_id, c.x, p.kx AS px, p.ky AS pv
             FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.x >= p.kx),
    nxt AS (SELECT c.event_id, p.kx AS nx, p.ky AS nv
            FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.x <= p.kx)
    SELECT prev.event_id, prev.user_id,
           round(CASE WHEN px IS NULL AND nx IS NULL THEN NULL
                      WHEN px IS NULL THEN nv
                      WHEN nx IS NULL THEN pv
                      WHEN nx = px THEN pv
                      ELSE pv + (nv - pv) * (x - px) / (nx - px) END, 6) AS v_interp
    FROM prev JOIN nxt USING (event_id)
    ORDER BY prev.event_id"""

  // Heavy hitters: exact counts with deterministic tie order; the
  // Misra-Gries containment flag is Spark-side (sketch vs exact, data-
  // verified), pinned to 1 here.
  val q50 = """
    WITH t AS (SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    w AS (SELECT unnest(toks) AS word FROM t)
    SELECT word, count(*) AS cnt, CAST(1 AS BIGINT) AS mg_ok
    FROM w GROUP BY word ORDER BY cnt DESC, word LIMIT 20"""

  // Robust outliers: per-column median/MAD replayed with quantile_cont
  // (exact interpolated percentile — the q39-proven twin of Spark's
  // `percentile`); the count compares against DuckDB's own median/MAD, so
  // both engines are self-consistent and the rounded stats hash-match.
  val q51: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      s"""SELECT '$c' AS "column", round(m, 6) AS median, round(d, 6) AS mad,
                 CAST(n AS BIGINT) AS n_outliers, CAST(1 AS BIGINT) AS apx_ok
          FROM (SELECT quantile_cont($c, 0.5) AS m FROM lineitem) mm,
               LATERAL (SELECT quantile_cont(abs($c - mm.m), 0.5) AS d
                        FROM lineitem) dd,
               LATERAL (SELECT count(*) AS n FROM lineitem
                        WHERE abs($c - mm.m) > 3.5 * 1.4826 * dd.d) cc"""
    }.mkString("", "\n    UNION ALL\n    ", "\n    ORDER BY \"column\"")
  }

  // WAV round-trip: the Spark side encodes each user's quantized values as
  // a real WAV payload and decodes it back byte-by-byte; the stats are
  // exact integers, so this replay from the raw table catches any
  // encode/parse defect.
  val q52 = """
    WITH s AS (SELECT user_id,
                      CAST(GREATEST(LEAST(floor(value * 60), 32767), -32768) AS BIGINT) AS q
               FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(q * q) AS BIGINT) AS sum_q2,
           CAST(max(q) AS BIGINT) AS peak_q
    FROM s GROUP BY user_id ORDER BY user_id"""

  // PGM round-trip: replays the quantize → encode → decode → resize chain
  // from the raw table; the resize is replayed through the SAME integer
  // source-index arithmetic (sx = x*w/ow) via 1-based list indexing.
  val q53 = """
    WITH s AS (SELECT user_id, event_id,
                      CAST(GREATEST(LEAST(floor(value), 255), 0) AS BIGINT) AS p
               FROM events),
    g AS (SELECT user_id, list(p ORDER BY event_id) AS ps FROM s GROUP BY user_id)
    SELECT user_id,
           CAST(len(ps) AS BIGINT) AS n_px,
           CAST(list_sum(ps) AS BIGINT) AS sum_p,
           CAST(list_sum(list_transform(ps, p -> p * p)) AS BIGINT) AS sum_p2,
           CAST(list_max(ps) AS BIGINT) AS max_p,
           CAST(LEAST(len(ps), 7) AS BIGINT) AS n_resized,
           CAST(list_sum(list_transform(range(LEAST(len(ps), 7)),
                x -> ps[(x * len(ps) // LEAST(len(ps), 7)) + 1])) AS BIGINT) AS sum_resized
    FROM g ORDER BY user_id"""

  // PNG round-trip: PNG is lossless, so the exact integer stats survive a
  // REAL deflate encode/decode and replay straight from the raw table; the
  // jpeg_ok gate flag is Spark-side (lossy path, dims + bounded mean),
  // pinned to 1 here.
  val q55 = """
    WITH s AS (SELECT user_id,
                      CAST(GREATEST(LEAST(floor(value), 255), 0) AS BIGINT) AS p
               FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(p) AS BIGINT) AS sum_p,
           CAST(sum(p * p) AS BIGINT) AS sum_p2,
           CAST(max(p) AS BIGINT) AS max_p,
           CAST(1 AS BIGINT) AS jpeg_ok
    FROM s GROUP BY user_id ORDER BY user_id"""

  // AIFF round-trip: same replay as q52 — the Spark side produced the stats
  // through the JDK audio provider chain instead of the byte-walk decoder.
  val q56 = """
    WITH s AS (SELECT user_id,
                      CAST(GREATEST(LEAST(floor(value * 60), 32767), -32768) AS BIGINT) AS q
               FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(q * q) AS BIGINT) AS sum_q2,
           CAST(max(q) AS BIGINT) AS peak_q
    FROM s GROUP BY user_id ORDER BY user_id"""

  // MP3 metadata round-trip: replays the MPEG-1 Layer III frame-length
  // arithmetic (144000*kbps/44100 + padding, kbps via the public bitrate
  // table) from the raw table — the Spark side produced the same numbers by
  // encoding real frame headers and sync-walking them back.
  val q58 = """
    WITH s AS (SELECT user_id,
                      (event_id % 14) + 1 AS bi,
                      event_id % 2 AS pad
               FROM events),
    f AS (SELECT user_id,
                 [32,40,48,56,64,80,96,112,128,160,192,224,256,320][bi] AS kbps,
                 pad
          FROM s)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(kbps) AS BIGINT) AS sum_kbps,
           CAST(sum(144000 * kbps // 44100 + pad) AS BIGINT) AS sum_bytes,
           CAST(count(*) * 1152 * 1000 // 44100 AS BIGINT) AS dur_ms,
           CAST(count(*) AS BIGINT) AS xing_frames,
           CAST(sum(144000 * kbps // 44100 + pad) AS BIGINT) AS xing_bytes,
           CAST(count(*) * 1152 * 1000 // 44100 AS BIGINT) AS xing_dur_ms,
           CAST((1 + user_id % 3) * 1152 AS BIGINT) AS dec_n,
           CAST(0 AS BIGINT) AS dec_abs_sum
    FROM f GROUP BY user_id ORDER BY user_id"""

  // ADTS/AAC metadata round-trip: replays the per-frame header-length
  // arithmetic (payload + 7, or + 9 when event_id % 3 = 0 adds a CRC), the
  // sampling-frequency table lookup keyed on user_id % 5, 1024 samples per
  // frame, and integer-floor duration — the Spark side carried the same
  // numbers through a real ADTS stream (7/9-byte headers + ID3 prefix) and
  // back through the syncword walk.
  val q154 = """
    WITH s AS (SELECT user_id,
                      (event_id % 200) + 50 AS plen,
                      CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS crc
               FROM events),
    f AS (SELECT user_id, plen + CASE WHEN crc = 1 THEN 9 ELSE 7 END AS flen,
                 crc
          FROM s),
    u AS (SELECT user_id,
                 [48000,44100,32000,24000,22050][CAST(user_id % 5 AS INT) + 1]
                   AS sr
          FROM (SELECT DISTINCT user_id FROM events))
    SELECT f.user_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(count(*) * 1024 AS BIGINT) AS samples,
           CAST(any_value(u.sr) AS BIGINT) AS sample_rate,
           CAST(1 + f.user_id % 2 AS BIGINT) AS channels,
           CAST(2 AS BIGINT) AS profile,
           CAST(sum(flen) AS BIGINT) AS sum_bytes,
           CAST(sum(crc) AS BIGINT) AS crc_frames,
           CAST(count(*) * 1024 * 1000 // any_value(u.sr) AS BIGINT) AS dur_ms
    FROM f JOIN u USING (user_id)
    GROUP BY f.user_id ORDER BY f.user_id"""

  // MP4 metadata round-trip: replays the duration/dims derivations from the
  // raw table — the Spark side carried the same numbers through a real
  // ISO-BMFF box tree (mvhd/tkhd 16.16 fixed point/stsd fourccs) and back.
  val q59 = """
    WITH s AS (SELECT user_id,
                      CAST(sum(CAST(GREATEST(LEAST(floor(value * 100), 100000), 0) AS BIGINT)) AS BIGINT) AS du
               FROM events GROUP BY user_id)
    SELECT user_id, du AS dur_units,
           CAST(du * 1000 // 600 AS BIGINT) AS dur_ms,
           CAST(2 AS BIGINT) AS n_tracks,
           CAST(16 + user_id % 1904 AS BIGINT) AS video_w,
           CAST(16 + user_id % 1064 AS BIGINT) AS video_h,
           'avc1,mp4a' AS codecs,
           CAST(du * 150 // 3000 AS BIGINT) AS v_samples,
           CAST((du * 150 // 3000) * (1000 + user_id % 5000) AS BIGINT) AS v_bytes,
           CAST(CASE WHEN du * 150 // 3000 > 0
                THEN (du * 150 // 3000) * (1000 + user_id % 5000) * 8 * 90000
                     // ((du * 150 // 3000) * 3000) // 1000
                ELSE 0 END AS BIGINT) AS v_kbps,
           CAST(du * 80 // 1024 AS BIGINT) AS a_samples,
           CAST((du * 80 // 1024) * (128 + user_id % 100) AS BIGINT) AS a_bytes
    FROM s ORDER BY user_id"""

  // (q61's packing oracle is q61bpe below — budgets moved from the
  // whitespace word count to the real BPE token count in round 7.)

  // Mixture sampling: replays the md5-uniform epoch draw (floor(w)
  // guaranteed + 1 with probability frac(w)) and the epoch expansion — the
  // whole training mix is deterministic in (doc_id, salt).
  val q62 = """
    WITH s AS (SELECT doc_id, source,
                      CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                           WHEN 'src2' THEN 0.4 ELSE 0.15 END AS w,
                      substr(md5(concat_ws('|', doc_id, 'mix')), 1, 13) AS hx
               FROM documents),
    u AS (SELECT doc_id, source, w,
                 list_reduce(list_prepend(0.0,
                     list_transform(generate_series(1, 13),
                       k -> CAST(strpos('0123456789abcdef', substr(hx, k, 1)) - 1 AS DOUBLE)
                            * pow(16.0, 13 - k))),
                   (a, x) -> a + x) / 4503599627370496.0 AS u
          FROM s),
    c AS (SELECT doc_id, source,
                 CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS BIGINT) AS n
          FROM u)
    SELECT doc_id, source, CAST(unnest(range(n)) AS BIGINT) AS epoch
    FROM c WHERE n > 0 ORDER BY doc_id, epoch"""

  // Z-order cells: replays the Morton interleave (bit i of column j →
  // output bit i*d + j) with the same bitwise arithmetic.
  val q63 = """
    WITH s AS (SELECT l_orderkey % 1024 AS x, l_partkey % 1024 AS y FROM lineitem),
    z AS (SELECT CAST(list_sum(list_transform(range(10),
                   i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1))))
                 AS BIGINT) AS z
          FROM s)
    SELECT z >> 14 AS cell, CAST(count(*) AS BIGINT) AS n,
           min(z) AS z_min, max(z) AS z_max
    FROM z GROUP BY cell ORDER BY cell"""

  // PQ ANN recall gate: like q30, the pass/fail flag is computed Spark-side
  // against the exact brute-force baseline; the oracle pins it.
  val q57 = """
    SELECT CAST(1 AS BIGINT) AS recall_pass, CAST(8 AS BIGINT) AS n_queries,
           CAST(10 AS BIGINT) AS k"""

  // Incremental dedup admission: md5 exact gates + ALL-PAIRS batch×history
  // portable-SimHash Hamming as the near-dup ground truth (the Spark side
  // used asymmetric pigeonhole blocking — equality proves its recall).
  val q65 = s"""
    WITH t AS (
      SELECT doc_id, md5($normText) AS fp,
             CASE WHEN length(trim(nt)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(nt), '\\s+') END AS toks
      FROM (SELECT doc_id, text, $normText AS nt FROM documents)),
    tok AS (SELECT doc_id, md5(unnest(toks)) AS m FROM t WHERE len(toks) > 0),
    votes AS (
      SELECT doc_id, b.i,
             sum(CASE WHEN ((CAST(strpos('0123456789abcdef',
                              substring(m, 16 - b.i // 4, 1)) - 1 AS INT)
                             >> (b.i % 4)) & 1) = 1
                      THEN 1 ELSE -1 END) AS s
      FROM tok, generate_series(0, 63) b(i)
      GROUP BY doc_id, b.i),
    shf AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN
                     CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                          ELSE CAST(CAST(1 AS BIGINT) << i AS HUGEINT) END
                   ELSE 0 END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id),
    b AS (SELECT doc_id, fp FROM t WHERE doc_id % 4 = 0),
    h AS (SELECT doc_id, fp FROM t WHERE doc_id % 4 <> 0),
    flags AS (
      SELECT b.doc_id,
             CASE WHEN b.fp IN (SELECT fp FROM h) THEN 1 ELSE 0 END AS exact_hist,
             CASE WHEN EXISTS (SELECT 1 FROM b b2
                               WHERE b2.fp = b.fp AND b2.doc_id < b.doc_id)
                  THEN 1 ELSE 0 END AS exact_batch,
             CASE WHEN EXISTS (SELECT 1 FROM shf bs, shf hs
                               WHERE bs.doc_id = b.doc_id
                                 AND hs.doc_id % 4 <> 0
                                 AND bit_count(xor(bs.sh, hs.sh)) <= 7)
                  THEN 1 ELSE 0 END AS near_hist
      FROM b)
    SELECT doc_id, CAST(exact_hist AS BIGINT) AS exact_hist,
           CAST(exact_batch AS BIGINT) AS exact_batch,
           CAST(near_hist AS BIGINT) AS near_hist,
           CAST(CASE WHEN exact_hist + exact_batch + near_hist = 0
                THEN 1 ELSE 0 END AS BIGINT) AS admitted
    FROM flags ORDER BY doc_id"""

  // Corpus-to-dataloader: the q45/q46/q10/q28+q44/q43/q62/q61 fragments
  // chained into one replay of CorpusPipeline.toDataloader — rules →
  // repetition cap → exact keepers → near-dup cluster keepers →
  // decontamination → mixture epochs → concat-and-cut packing. Stage 3
  // groups by md5 where Spark groups by xxhash64: both are collision-free
  // on the fixture, so the partitions (and min-id keepers) coincide.
  private val curationPrefix = s"""
    WITH RECURSIVE
    corpus AS (SELECT doc_id, text, source FROM documents WHERE doc_id >= 10),
    g1t AS (SELECT doc_id, text, length(text) AS n,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks
            FROM corpus),
    g1f AS (SELECT doc_id, len(toks) AS nw,
                   CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                     list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END AS mwl,
                   len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this','are','from'], x))) AS stop_hits,
                   CASE WHEN n = 0 THEN 0.0 ELSE
                     (n - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / n END AS punct
            FROM g1t),
    s1 AS (SELECT doc_id FROM g1f
           WHERE nw BETWEEN 50 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
             AND stop_hits >= 2 AND punct <= 0.1),
    r2t AS (SELECT c.doc_id,
                   CASE WHEN length(trim(c.text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(c.text), '\\s+') END AS toks
            FROM corpus c JOIN s1 USING (doc_id)),
    r2c AS (SELECT doc_id, w, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS w FROM r2t WHERE len(toks) > 0)
            GROUP BY doc_id, w),
    s2 AS (SELECT doc_id FROM (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS twf
                               FROM r2c GROUP BY doc_id)
           WHERE twf <= 0.5),
    e3 AS (SELECT c.doc_id, md5($normText) AS fp
           FROM corpus c JOIN s2 USING (doc_id)),
    s3 AS (SELECT min(doc_id) AS doc_id FROM e3 GROUP BY fp),
    n4g AS (SELECT t.doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh
            FROM (SELECT c.doc_id,
                         CASE WHEN length(trim(c.text)) = 0 THEN []::VARCHAR[]
                              ELSE regexp_split_to_array(trim(c.text), '\\s+') END AS toks
                  FROM corpus c JOIN s3 USING (doc_id)) t),
    n4j AS (SELECT id_a, id_b FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     len(list_intersect(a.sh, b.sh)) AS inter,
                     len(a.sh) AS na, len(b.sh) AS nb
              FROM n4g a JOIN n4g b ON a.doc_id < b.doc_id)
            WHERE round(CASE WHEN na + nb - inter = 0 THEN 0.0
                        ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)
                        END, 6) >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM n4j
              UNION ALL SELECT id_b, id_a FROM n4j),
    lbl(id, label) AS (
        SELECT doc_id, doc_id FROM s3
      UNION
        SELECT e.src, l.label FROM edges e JOIN lbl l ON l.id = e.dst),
    s4 AS (SELECT id AS doc_id FROM lbl GROUP BY id HAVING id = min(label)),
    dg AS (SELECT doc_id,
                  CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
                       ELSE list_distinct(list_transform(generate_series(1, len(toks) - 4),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) END AS sh
           FROM (SELECT doc_id,
                        CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                             ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
                 FROM documents) t),
    benchsh AS (SELECT DISTINCT unnest(sh) AS s5 FROM dg WHERE doc_id < 10),
    contam AS (SELECT DISTINCT doc_id
               FROM (SELECT doc_id, unnest(sh) AS s5 FROM dg WHERE doc_id >= 10) g
               JOIN benchsh USING (s5))"""

  val q66 = s"""
    $curationPrefix,
    curated AS (SELECT doc_id FROM s4
                WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
    mu AS (SELECT c.doc_id,
                  CASE d.source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                       WHEN 'src2' THEN 0.4 ELSE 0.15 END AS wgt,
                  list_reduce(list_prepend(0.0,
                      list_transform(generate_series(1, 13),
                        k -> CAST(strpos('0123456789abcdef',
                               substr(substr(md5(concat_ws('|', c.doc_id, 'mix')), 1, 13), k, 1)) - 1 AS DOUBLE)
                             * pow(16.0, 13 - k))),
                    (a, x) -> a + x) / 4503599627370496.0 AS u
           FROM curated c JOIN documents d USING (doc_id)),
    ep AS (SELECT doc_id, CAST(unnest(range(nc)) AS BIGINT) AS epoch
           FROM (SELECT doc_id,
                        CAST(floor(wgt) + CASE WHEN u < wgt - floor(wgt) THEN 1 ELSE 0 END AS BIGINT) AS nc
                 FROM mu)
           WHERE nc > 0),
    tk AS (SELECT doc_id,
                  CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tok
           FROM documents),
    st AS (SELECT ep.doc_id, ep.epoch, tk.tok,
                  sum(tk.tok) OVER (ORDER BY ep.epoch, ep.doc_id) AS cum
           FROM ep JOIN tk USING (doc_id))
    SELECT doc_id, epoch, CAST(tok AS BIGINT) AS n_tok,
           CAST((cum - tok) // 512 AS BIGINT) AS first_bin,
           CAST(CASE WHEN tok > 0 THEN (cum - 1) // 512
                     ELSE (cum - tok) // 512 END AS BIGINT) AS last_bin,
           CAST((cum - tok) % 512 AS BIGINT) AS bin_off
    FROM st ORDER BY doc_id, epoch"""

  // Key-skew diagnostic: exact top-5 hot keys + global ratio.
  val q67 = """
    WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
               FROM events GROUP BY 1),
    s AS (SELECT sum(cnt) AS total_rows, count(*) AS n_keys FROM c)
    SELECT key, CAST(cnt AS BIGINT) AS cnt,
           CAST(total_rows AS BIGINT) AS total_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           round(cnt * n_keys / total_rows, 6) AS skew_ratio
    FROM c, s ORDER BY cnt DESC, key LIMIT 5"""

  // Vocab encoding: replays the top-100 vocabulary (cnt desc, token asc
  // ids) and the per-doc digests incl. the order-sensitive
  // position-weighted sum.
  val q68 = """
    WITH t AS (SELECT doc_id,
                      CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    vc AS (SELECT token, count(*) AS cnt
           FROM (SELECT unnest(toks) AS token FROM t) GROUP BY token),
    v AS (SELECT token, row_number() OVER (ORDER BY cnt DESC, token) - 1 AS id
          FROM vc ORDER BY cnt DESC, token LIMIT 100),
    p AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i,
                 unnest(toks) AS token
          FROM t WHERE len(toks) > 0),
    e AS (SELECT p.doc_id, p.i, coalesce(v.id, 100) AS tid
          FROM p LEFT JOIN v USING (token))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(CASE WHEN tid = 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           CAST(sum(tid) AS BIGINT) AS sum_ids,
           CAST(sum(i * tid) AS BIGINT) AS possum_ids
    FROM e GROUP BY doc_id ORDER BY doc_id"""

  // Log compaction: latest row per key under the (ts, event_id) total
  // order, replayed with a window argmax.
  val q69 = """
    WITH s AS (SELECT user_id, event_type,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
                      round(value, 6) AS value,
                      row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
                                                  event_id DESC) AS rn
               FROM events)
    SELECT user_id, event_type, CAST(ts_us AS BIGINT) AS ts_us,
           event_id, value
    FROM s WHERE rn = 1 ORDER BY user_id, event_type"""

  // Equi-depth binning: plain ntile replay of the range-partitioned form.
  val q70 = """
    WITH r AS (SELECT l_extendedprice,
                      ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                                      l_linenumber) AS bucket
               FROM lineitem)
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi
    FROM r GROUP BY bucket ORDER BY bucket"""

  // Group-limit: window-form replay of the bounded-aggregator top-3.
  val q71 = """
    WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey) AS rank
               FROM orders)
    SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey,
           round(o_totalprice, 2) AS price
    FROM r WHERE rank <= 3 ORDER BY o_custkey, rank"""

  // PII redaction: plants the same doc_id-derived PII and scrubs with the
  // same patterns in the same order ('g' = global, matching Spark's
  // replace-all default); the md5 of the redacted text breaks on any
  // pattern/order/token divergence.
  val q72 = """
    WITH t AS (SELECT doc_id,
                      text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                      '@example.com or +1 (555) 01' || CAST(doc_id AS VARCHAR) ||
                      ' node 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
                      CAST(doc_id % 100 AS VARCHAR) AS pt
               FROM documents),
    r1 AS (SELECT doc_id, pt,
                  len(regexp_extract_all(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                  regexp_replace(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
           FROM t),
    r2 AS (SELECT doc_id, n_email,
                  len(regexp_extract_all(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ipv4,
                  regexp_replace(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IPV4>', 'g') AS t2
           FROM r1),
    r3 AS (SELECT doc_id, n_email, n_ipv4,
                  len(regexp_extract_all(t2, '\+?[0-9][0-9()\-. ]{5,}[0-9]')) AS n_phone,
                  regexp_replace(t2, '\+?[0-9][0-9()\-. ]{5,}[0-9]', '<PHONE>', 'g') AS t3
           FROM r2)
    SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
           CAST(n_ipv4 AS BIGINT) AS n_ipv4,
           CAST(n_phone AS BIGINT) AS n_phone,
           md5(t3) AS redacted_md5
    FROM r3 ORDER BY doc_id"""

  // UQ-calibration reliability table: deterministic surrogate (exact
  // integer-derived predicted variance, closed-form squared error)
  // replayed through a plain ntile + per-bin averages.
  val q73 = """
    WITH s AS (SELECT event_id,
                      0.05 + CAST(event_id % 97 AS DOUBLE) / 100.0 AS var_pred,
                      value * 0.1 * value * 0.1 AS sq_err
               FROM events),
    b AS (SELECT var_pred, sq_err,
                 ntile(10) OVER (ORDER BY var_pred, event_id) AS bucket
          FROM s)
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
           round(avg(var_pred), 6) AS expected_var,
           round(avg(sq_err), 6) AS realized_mse
    FROM b GROUP BY bucket ORDER BY bucket"""

  // IVF-PQ recall gate: like q30/q57, the pass flag is computed Spark-side
  // against exact brute force; the oracle pins it.
  val q64 = """
    SELECT CAST(1 AS BIGINT) AS recall_pass, CAST(8 AS BIGINT) AS n_queries,
           CAST(10 AS BIGINT) AS k"""

  // BDQA flagship-loop trace: replays the md5-deterministic init sample and
  // the nine explorer picks with a recursive CTE that carries the picked-id
  // list (the pool shrinks by exactly the picked set — the loop's only
  // state). Arithmetic mirrors ActiveSampling.deterministicTrace
  // operation-for-operation: the fixed N(0.5, 0.5) density surrogate, the
  // q26 52-bit md5 uniform, ln(u)·dens(y) E-S keys, and score DESC, id
  // tie-breaks.
  val q54 = """
    WITH RECURSIVE g AS (
      SELECT a.i * 50 + b.i AS id,
             -1.0 + a.i * (2.0 / 49) AS x1,
             -1.0 + b.i * (2.0 / 49) AS x2
      FROM generate_series(0, 49) a(i), generate_series(0, 49) b(i)),
    b AS (
      SELECT id,
             pow(x1, 3) - x1 + pow(x2, 2) + 0.5 * sin(8 * x1 * x2) AS y,
             pow(x1 * 0.9, 3) - (x1 * 0.9) + pow(x2 * 0.9, 2)
               + 0.5 * sin(8 * (x1 * 0.9) * (x2 * 0.9)) AS pred,
             0.05 + 0.3 * (x1 * x1 + x2 * x2) AS var
      FROM g),
    h AS (SELECT *, substr(md5(CAST(id AS VARCHAR)), 1, 13) AS hx FROM b),
    uu AS (SELECT *, list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, 13),
                 k -> CAST(strpos('0123456789abcdef', substr(hx, k, 1)) - 1 AS DOUBLE)
                      * pow(16.0, 13 - k))),
             (a, x) -> a + x) / 4503599627370496.0 AS u
           FROM h),
    sc AS (
      SELECT id,
             (pred - y) * (pred - y) AS se,
             var AS us,
             var / GREATEST(exp(-0.5 * (((pred - 0.5) / 0.5) * ((pred - 0.5) / 0.5)))
                            / (0.5 * sqrt(2 * pi())), 1e-12) AS lw,
             ln(u) * (exp(-0.5 * (((y - 0.5) / 0.5) * ((y - 0.5) / 0.5)))
                      / (0.5 * sqrt(2 * pi()))) AS es_key
      FROM uu),
    init AS (SELECT id FROM sc ORDER BY es_key DESC, id LIMIT 100),
    p AS (SELECT sc.* FROM sc WHERE id NOT IN (SELECT id FROM init)),
    sim(step, explorer, id, score, picked) AS (
      SELECT 0, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
             CAST(NULL AS DOUBLE), []::BIGINT[]
      UNION ALL
      SELECT t.step + 1,
             CASE t.step % 3 WHEN 0 THEN 'se' WHEN 1 THEN 'us' ELSE 'us_lw' END,
             (SELECT id FROM p WHERE NOT list_contains(t.picked, id)
              ORDER BY CASE t.step % 3 WHEN 0 THEN se WHEN 1 THEN us ELSE lw END DESC, id
              LIMIT 1),
             (SELECT CASE t.step % 3 WHEN 0 THEN se WHEN 1 THEN us ELSE lw END
              FROM p WHERE NOT list_contains(t.picked, id)
              ORDER BY CASE t.step % 3 WHEN 0 THEN se WHEN 1 THEN us ELSE lw END DESC, id
              LIMIT 1),
             list_append(t.picked,
               (SELECT id FROM p WHERE NOT list_contains(t.picked, id)
                ORDER BY CASE t.step % 3 WHEN 0 THEN se WHEN 1 THEN us ELSE lw END DESC, id
                LIMIT 1))
      FROM sim t WHERE t.step < 9)
    SELECT CAST((step + 2) // 3 AS BIGINT) AS iter, explorer,
           id AS selected_id, round(score, 6) AS score
    FROM sim WHERE step >= 1 ORDER BY iter, explorer"""

  // --- q75: the FULL ActiveSampling.run replay -----------------------------
  // Composition of three already-proven devices: the q54 grid/label/md5-
  // uniform fixture, the q25 fitBinned KDE convolution (run 4x: trueKde +
  // one pred-KDE refit per iteration over the SHRINKING pool), and the q54
  // pick chain (se/us/us_lw with id tie-breaks). CTEs are MATERIALIZED —
  // DuckDB otherwise inlines them per reference and the pdf grids recompute
  // combinatorially. Interpolation is the join form of Interp.linearUniform
  // (idx = clamp(floor(pos)), frac clamped, v0 + (v1-v0)*frac).
  private val q75G = 256 // kdeGridSize in the q75 oracle-parity config

  private def q75KdeBlock(pfx: String, src: String, value: String): String = {
    val gm1 = q75G - 1
    s"""
    ${pfx}src AS (
      SELECT CAST($value AS DOUBLE) AS v FROM $src, p
      WHERE $value IS NOT NULL AND NOT isnan(CAST($value AS DOUBLE))
        AND CAST($value AS DOUBLE) >= p.lo AND CAST($value AS DOUBLE) <= p.hi),
    ${pfx}fr AS (
      SELECT least(greatest(CAST(floor((v - lo) / step) AS INTEGER), 0), $gm1) AS i0,
             least(greatest((v - lo) / step -
               least(greatest(CAST(floor((v - lo) / step) AS INTEGER), 0), $gm1), 0.0), 1.0) AS frac
      FROM ${pfx}src, p),
    ${pfx}pairs AS (
      SELECT i0 AS bin, 1.0 * (1.0 - frac) AS w FROM ${pfx}fr
      UNION ALL
      SELECT least(i0 + 1, $gm1) AS bin, 1.0 * frac AS w FROM ${pfx}fr),
    ${pfx}bins AS MATERIALIZED (SELECT bin, sum(w) AS wsum FROM ${pfx}pairs GROUP BY bin),
    ${pfx}tot AS (SELECT sum(wsum) AS total FROM ${pfx}bins),
    ${pfx}conv AS (
      SELECT t.j AS j, sum((t.wsum / t.total) * t.knorm * exp(-0.5 * (t.tt * t.tt))) AS pdf
      FROM (SELECT j.j, b.wsum, tt.total, p.knorm, (j.j - b.bin) * p.step / p.bw AS tt
            FROM generate_series(0, $gm1) j(j)
            CROSS JOIN ${pfx}bins b CROSS JOIN ${pfx}tot tt CROSS JOIN p
            WHERE b.wsum > 0 AND abs(j.j - b.bin) <= p.support) AS t(j, wsum, total, knorm, tt)
      GROUP BY t.j),
    ${pfx}pdf AS MATERIALIZED (
      SELECT g.g AS j, coalesce(c.pdf, 0.0) AS pdf
      FROM generate_series(0, $gm1) g(g) LEFT JOIN ${pfx}conv c ON c.j = g.g)"""
  }

  private def q75IterBlock(i: Int, pool: String): String = {
    val gm1 = q75G - 1
    val gm2 = q75G - 2
    s"""
    ${q75KdeBlock(s"k$i", pool, "pred")},
    m$i AS (SELECT avg(pow(pred - y, 2)) AS mse, avg(var) AS mvar FROM $pool),
    d${i}g AS (
      SELECT g.g AS j, p.lo + g.g * p.step AS gx,
             (p.lo + g.g * p.step - p.lo) / p.step AS pos,
             least(greatest(CAST(floor((p.lo + g.g * p.step - p.lo) / p.step) AS INTEGER), 0), $gm2) AS idx
      FROM generate_series(0, $gm1) g(g) CROSS JOIN p),
    d$i AS (
      SELECT q.j, q.gx,
             abs(greatest(-6.0, ln(greatest(
                   p0.pdf + (p1.pdf - p0.pdf) * least(greatest(q.pos - q.idx, 0.0), 1.0), 1e-300)))
               - greatest(-6.0, ln(greatest(t.pdf, 1e-300)))) AS d
      FROM d${i}g q
      JOIN k${i}pdf p0 ON p0.j = q.idx
      JOIN k${i}pdf p1 ON p1.j = q.idx + 1
      JOIN tkpdf t ON t.j = q.j),
    tz$i AS (
      SELECT sum(seg) AS tz FROM (
        SELECT (d + lag(d) OVER (ORDER BY j)) / 2.0 *
               (gx - lag(gx) OVER (ORDER BY j)) AS seg
        FROM d$i) WHERE seg IS NOT NULL),
    se$i AS MATERIALIZED (SELECT id FROM $pool ORDER BY pow(pred - y, 2) DESC, id LIMIT 1),
    us$i AS MATERIALIZED (SELECT id FROM $pool WHERE id NOT IN (SELECT id FROM se$i)
              ORDER BY var DESC, id LIMIT 1),
    lw${i}q AS (
      SELECT id, var, (pred - p.lo) / p.step AS pos,
             least(greatest(CAST(floor((pred - p.lo) / p.step) AS INTEGER), 0), $gm2) AS idx
      FROM $pool, p),
    lw$i AS MATERIALIZED (
      SELECT q.id FROM lw${i}q q
      JOIN k${i}pdf p0 ON p0.j = q.idx
      JOIN k${i}pdf p1 ON p1.j = q.idx + 1
      WHERE q.id NOT IN (SELECT id FROM se$i UNION ALL SELECT id FROM us$i)
      ORDER BY (1.0 / greatest(p0.pdf + (p1.pdf - p0.pdf) *
                  least(greatest(q.pos - q.idx, 0.0), 1.0), 1e-12)) * q.var DESC, q.id
      LIMIT 1),
    pool${i + 1} AS MATERIALIZED (
      SELECT * FROM $pool WHERE id NOT IN (
        SELECT id FROM se$i UNION ALL SELECT id FROM us$i UNION ALL SELECT id FROM lw$i))"""
  }

  val q75: String = {
    val gm1 = q75G - 1
    val gm2 = q75G - 2
    s"""
    WITH base AS MATERIALIZED (
      SELECT a.i * 50 + b.i AS id,
             -1.0 + a.i * (2.0 / 49) AS x1,
             -1.0 + b.i * (2.0 / 49) AS x2
      FROM generate_series(0, 49) a(i), generate_series(0, 49) b(i)),
    lab AS MATERIALIZED (
      SELECT id, x1, x2,
             pow(x1, 3) - x1 + pow(x2, 2) + 0.5 * sin(8 * x1 * x2) AS y,
             pow(x1 * 0.9, 3) - (x1 * 0.9) + pow(x2 * 0.9, 2)
               + 0.5 * sin(8 * (x1 * 0.9) * (x2 * 0.9)) AS pred,
             0.05 + 0.3 * (x1 * x1 + x2 * x2) AS var
      FROM base),
    uu AS MATERIALIZED (
      SELECT *, list_reduce(list_prepend(0.0,
          list_transform(generate_series(1, 13),
            k -> CAST(strpos('0123456789abcdef',
                   substr(substr(md5(CAST(id AS VARCHAR)), 1, 13), k, 1)) - 1 AS DOUBLE)
                 * pow(16.0, 13 - k))),
        (a, x) -> a + x) / 4503599627370496.0 AS u
      FROM lab),
    p AS MATERIALIZED (
      SELECT min(y) - 3 * CAST(0.2 AS DOUBLE) AS lo,
             max(y) + 3 * CAST(0.2 AS DOUBLE) AS hi,
             CAST(0.2 AS DOUBLE) AS bw,
             (max(y) + 3 * CAST(0.2 AS DOUBLE) - (min(y) - 3 * CAST(0.2 AS DOUBLE))) / $gm1 AS step,
             1.0 / (CAST(0.2 AS DOUBLE) * sqrt(2.0 * pi())) AS knorm,
             least($q75G, CAST(ceil(8.5 * CAST(0.2 AS DOUBLE) /
               ((max(y) + 3 * CAST(0.2 AS DOUBLE) - (min(y) - 3 * CAST(0.2 AS DOUBLE))) / $gm1)) AS INTEGER) + 1) AS support
      FROM lab),
    ${q75KdeBlock("tk", "lab", "y")},
    esq AS (
      SELECT id, u, (y - p.lo) / p.step AS pos,
             least(greatest(CAST(floor((y - p.lo) / p.step) AS INTEGER), 0), $gm2) AS idx
      FROM uu, p),
    init AS MATERIALIZED (
      SELECT q.id FROM esq q
      JOIN tkpdf p0 ON p0.j = q.idx
      JOIN tkpdf p1 ON p1.j = q.idx + 1
      ORDER BY ln(q.u) * greatest(p0.pdf + (p1.pdf - p0.pdf) *
                 least(greatest(q.pos - q.idx, 0.0), 1.0), 1e-12) DESC, q.id
      LIMIT 100),
    pool1 AS MATERIALIZED (SELECT * FROM uu WHERE id NOT IN (SELECT id FROM init)),
    ${q75IterBlock(1, "pool1")},
    ${q75IterBlock(2, "pool2")},
    ${q75IterBlock(3, "pool3")}
    SELECT CAST(1 AS BIGINT) AS iter, round(mse, 6) AS mse, round(mvar, 6) AS mvar,
           round(tz, 6) AS log_pdf_err, CAST(103 AS BIGINT) AS train_n, CAST(2397 AS BIGINT) AS pool_n
    FROM m1, tz1
    UNION ALL
    SELECT CAST(2 AS BIGINT), round(mse, 6), round(mvar, 6), round(tz, 6),
           CAST(106 AS BIGINT), CAST(2394 AS BIGINT) FROM m2, tz2
    UNION ALL
    SELECT CAST(3 AS BIGINT), round(mse, 6), round(mvar, 6), round(tz, 6),
           CAST(109 AS BIGINT), CAST(2391 AS BIGINT) FROM m3, tz3
    ORDER BY iter"""
  }

  // Embedding-LSH recall gate (q30/q57/q64 pattern): truth is planted
  // Spark-side with exact-cosine verification and the pass flag is computed
  // there; the oracle pins it (a recall collapse = driver-red row).
  val q74 = """
    SELECT CAST(1 AS BIGINT) AS recall_pass, CAST(0.8 AS DOUBLE) AS gate,
           CAST(16 AS BIGINT) AS tables, CAST(16 AS BIGINT) AS planes"""

  // Deterministic hash split: the md5-uniform (q26 device) + cumulative-cut
  // CASE replayed per row. Cut expressions are computed the same way the
  // Scala side folds them (0.8, then 0.8 + 0.1 in IEEE doubles) so a
  // uniform landing between 0.9 and the folded sum can't diverge.
  val q76 = """
    WITH u AS (
      SELECT doc_id, list_reduce(list_prepend(0.0,
          list_transform(generate_series(1, 13),
            k -> CAST(strpos('0123456789abcdef',
                   substr(substr(md5(concat_ws('|', doc_id, 'split')), 1, 13), k, 1)) - 1 AS DOUBLE)
                 * pow(16.0, 13 - k))),
        (a, x) -> a + x) / 4503599627370496.0 AS u
      FROM documents)
    SELECT doc_id,
           CASE WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
                WHEN u < CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE) THEN 'val'
                ELSE 'test' END AS split
    FROM u ORDER BY doc_id"""

  // Semantic-keeper gate (q74's planted fixture through components): the
  // flags are computed Spark-side from closed-form truth; the oracle pins
  // them — a recall collapse (>10% of eligible twins kept), spurious pair,
  // or keeper defect flips one.
  val q77 = """
    SELECT CAST(1 AS BIGINT) AS twins_dropped_pass,
           CAST(1 AS BIGINT) AS base_intact,
           CAST(1 AS BIGINT) AS truth_nonempty,
           CAST(0.95 AS DOUBLE) AS threshold"""

  // Sliding doc chunks: q28's tokenizer + the operator's chunk-count
  // formula (1 + max(0, ceil((n-64)/32))) + 1-based inclusive list slices
  // — per-chunk md5 digests check content and position.
  val q78 = """
    WITH t AS (SELECT doc_id,
                      CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    c AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    nc AS (SELECT *, CASE WHEN n <= 0 THEN 0
                     ELSE 1 + greatest(0, CAST(ceil((n - 64) / 32.0) AS INTEGER))
                     END AS nchunks FROM c),
    ex AS (SELECT doc_id, toks, unnest(range(nchunks)) AS chunk_id
           FROM nc WHERE nchunks > 0),
    x AS (SELECT doc_id, chunk_id,
                 toks[(chunk_id * 32 + 1):(chunk_id * 32 + 64)] AS chunk
          FROM ex)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM x ORDER BY doc_id, chunk_id"""

  // Embedding incremental-admission gate (q74/q77 convention): flags are
  // computed Spark-side against closed-form planted truth; the oracle pins
  // them — a near-gate recall collapse, a broken bit-exact gate, or an
  // admission leak turns a flag 0 and reds the row.
  val q80 = """
    SELECT CAST(1 AS BIGINT) AS twins_near_pass,
           CAST(1 AS BIGINT) AS copies_exact_ok,
           CAST(1 AS BIGINT) AS batch_dup_ok,
           CAST(0.95 AS DOUBLE) AS threshold"""

  // SemDeDup FULL replay (not a recall gate): rebuild the planted corpus
  // (q74/q77 twin arithmetic), collapse distinct vectors, pick the
  // k = max(8, n/256) init medoids by the md5-uniform (q76 device keyed on
  // gid; k = 8 at every graded scale), run 2 Lloyd
  // steps (per-coordinate avg of each cell's DISTINCT vectors via zipped
  // unnest; empty cells keep the previous centroid), assign by
  // rounded-cosine argmax (ties to the SMALLER cell — Spark's
  // array_position finds the first max), score every within-cell pair,
  // close components with the
  // recursive min-label CTE (q44), keeper = min id. Cosines round to 9 dp
  // before every discrete decision so cross-engine float-sum order (~1e-15)
  // can't flip an assignment; all output columns are exact integers.
  val q81: String = {
    val u = """(list_reduce(list_prepend(0.0,
      list_transform(generate_series(1, 13),
        k -> CAST(strpos('0123456789abcdef',
               substr(substr(md5(concat_ws('|', gid, 'semdedup')), 1, 13), k, 1)) - 1 AS DOUBLE)
             * pow(16.0, 13 - k))),
    (a, x) -> a + x) / 4503599627370496.0)"""
    def iter(i: Int, prev: String) = s"""
    asg$i AS MATERIALIZED (
      SELECT gid, v, cell FROM (
        SELECT g.gid, g.v, c.cell,
               row_number() OVER (PARTITION BY g.gid
                 ORDER BY round(${cosineD("g.v", "c.cent")}, 9) DESC, c.cell ASC) AS rn
        FROM groups g CROSS JOIN $prev c) WHERE rn = 1),
    cents$i AS MATERIALIZED (
      SELECT p.cell, coalesce(m.cent, p.cent) AS cent
      FROM $prev p LEFT JOIN (
        SELECT cell, list(m ORDER BY pos) AS cent FROM (
          SELECT cell, pos, avg(val) AS m FROM (
            SELECT cell, unnest(range(len(v))) AS pos, unnest(v) AS val
            FROM asg$i) GROUP BY cell, pos) GROUP BY cell) m
      ON m.cell = p.cell)"""
    s"""
    WITH RECURSIVE off AS (SELECT max(vec_id) + 1 AS o FROM embeddings),
    corpus AS MATERIALIZED (
      SELECT vec_id AS vid,
             list_transform(generate_series(1, len(embedding)),
               i -> embedding[i]::DOUBLE) AS v
      FROM embeddings WHERE embedding IS NOT NULL
      UNION ALL
      SELECT e.vec_id + o.o,
             list_transform(generate_series(1, len(e.embedding)),
               i -> e.embedding[i]::DOUBLE * (1.0 + 0.2 * CAST((i - 1) % 3 - 1 AS DOUBLE)))
      FROM embeddings e, off o WHERE e.embedding IS NOT NULL AND e.vec_id % 10 = 0),
    groups AS MATERIALIZED (
      SELECT v, min(vid) AS gid FROM corpus GROUP BY v),
    kk AS (SELECT greatest(8, count(*) // 256) AS k FROM corpus),
    cents0 AS MATERIALIZED (
      SELECT cell, cent FROM (
        SELECT row_number() OVER (ORDER BY $u, gid) - 1 AS cell, v AS cent
        FROM groups) WHERE cell < (SELECT k FROM kk)),
    ${iter(1, "cents0")},
    ${iter(2, "cents1")},
    asgF AS MATERIALIZED (
      SELECT gid, v, cell FROM (
        SELECT g.gid, g.v, c.cell,
               row_number() OVER (PARTITION BY g.gid
                 ORDER BY round(${cosineD("g.v", "c.cent")}, 9) DESC, c.cell ASC) AS rn
        FROM groups g CROSS JOIN cents2 c) WHERE rn = 1),
    pr AS MATERIALIZED (
      SELECT a.gid AS id_a, b.gid AS id_b
      FROM asgF a JOIN asgF b ON a.cell = b.cell AND a.gid < b.gid
      WHERE round(${cosineD("a.v", "b.v")}, 9) >= 0.95),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pr
              UNION ALL SELECT id_b, id_a FROM pr),
    lbl(id, label) AS (
        SELECT gid, gid FROM groups
      UNION
        SELECT e.src, l.label FROM edges e JOIN lbl l ON l.id = e.dst),
    keep AS (SELECT id AS gid, min(label) AS keeper FROM lbl GROUP BY id)
    SELECT c.vid AS doc_id, CAST(f.cell AS BIGINT) AS cell, k.keeper AS keeper,
           CAST(CASE WHEN c.vid <> k.keeper THEN 1 ELSE 0 END AS BIGINT) AS dropped
    FROM corpus c JOIN groups g ON c.v = g.v
    JOIN asgF f ON f.gid = g.gid
    JOIN keep k ON k.gid = g.gid
    ORDER BY doc_id"""
  }

  // DSIR importance selection, FULL replay: token buckets via the md5
  // integer fold (first 6 hex chars mod 256 — exact integers in both
  // engines), add-one-smoothed per-bucket target/corpus log ratios
  // densified over range(256) (buckets with no tokens get the pure
  // smoothing ratio, mirroring the Spark driver arrays), per-doc score =
  // ordered fold of bucket ratios in TOKEN order (list ORDER BY pos =
  // Spark's aggregate-HOF order; ~1e-14 ln/sum ulp drift absorbed by the
  // 6 dp round), keep flag = rank by (rounded score desc, doc_id) ≤
  // floor(n·0.25). Score and flag both hash-compared.
  val q82: String = {
    val bucket = """CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, 6),
    k -> CAST((strpos('0123456789abcdef', substr(substr(md5(tk), 1, 6), k, 1)) - 1) * CAST(pow(16.0, 6 - k) AS BIGINT) AS BIGINT))),
  (a, x) -> a + x) % 256 AS BIGINT)"""
    s"""
    WITH t AS (SELECT doc_id, lang,
          CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents),
    btok AS (SELECT doc_id, pos, lang, $bucket AS b FROM
      (SELECT doc_id, lang, unnest(range(len(toks))) AS pos, unnest(toks) AS tk FROM t)),
    cnt AS (SELECT b, count(*) AS tot,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt
            FROM btok GROUP BY b),
    dense AS (SELECT bs.b AS b, coalesce(c.tot, 0) AS tot, coalesce(c.tgt, 0) AS tgt
              FROM (SELECT unnest(range(256)) AS b) bs LEFT JOIN cnt c ON c.b = bs.b),
    tots AS (SELECT sum(tot) + 256.0 AS tot_all, sum(tgt) + 256.0 AS tgt_all FROM dense),
    lrl AS (SELECT list(ln((tgt + 1.0) / tgt_all) - ln((tot + 1.0) / tot_all) ORDER BY b) AS l
            FROM dense, tots),
    scl AS (SELECT doc_id, list(lrl.l[b + 1] ORDER BY pos) AS terms
            FROM btok, lrl GROUP BY doc_id),
    sc AS (SELECT t.doc_id,
                  round(coalesce(list_reduce(list_prepend(0.0, scl.terms), (a, x) -> a + x), 0.0), 6) AS score
           FROM t LEFT JOIN scl ON scl.doc_id = t.doc_id),
    n AS (SELECT count(*) AS n FROM t),
    rk AS (SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM sc)
    SELECT doc_id, score,
           CAST(CASE WHEN rn <= floor(n.n * 0.25) THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM rk, n ORDER BY doc_id"""
  }

  // CCNet-style bigram-LM cross-entropy, FULL replay: the oracle retrains
  // the add-one bigram LM on the same English slice (unigram counts cu,
  // bigram counts cb, totals T and V), then re-derives every per-doc
  // -ln(p) term — first token under the unigram model, tokens 2..n under
  // p(w2|w1) = (cb+1)/(cu1+V) — and the per-token average. Unordered sum
  // of ~n ln terms drifts ~1e-15 relative between engines; the 6 dp round
  // absorbs it. Doc set (non-empty only), n_tokens, and ce hash-compared.
  val q83 = """
    WITH t AS (SELECT doc_id, lang,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    uni AS (SELECT w, count(*) AS cu
            FROM (SELECT unnest(toks) AS w FROM t WHERE lang = 'en') GROUP BY w),
    tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM uni),
    bg AS (SELECT doc_id, lang, toks[i-1] AS w1, toks[i] AS w2
           FROM t, unnest(generate_series(2, len(toks))) AS u(i)),
    bi AS (SELECT w1, w2, count(*) AS cb FROM bg WHERE lang = 'en' GROUP BY w1, w2),
    sc AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
    frst AS (SELECT s.doc_id,
                -ln((CAST(coalesce(u.cu, 0) AS DOUBLE) + 1.0) / (tot.t + tot.v)) AS h1
              FROM sc s LEFT JOIN uni u ON u.w = s.toks[1] CROSS JOIN tot),
    rest AS (SELECT doc_id, sum(h) AS hrest FROM (
               SELECT g.doc_id,
                 -ln((CAST(coalesce(b.cb, 0) AS DOUBLE) + 1.0) /
                     (CAST(coalesce(u.cu, 0) AS DOUBLE) + tot.v)) AS h
               FROM bg g
               LEFT JOIN bi b ON b.w1 = g.w1 AND b.w2 = g.w2
               LEFT JOIN uni u ON u.w = g.w1
               CROSS JOIN tot) GROUP BY doc_id)
    SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_tokens,
           round((f.h1 + coalesce(r.hrest, 0.0)) / CAST(s.n AS DOUBLE), 6) AS ce
    FROM sc s JOIN frst f ON f.doc_id = s.doc_id
    LEFT JOIN rest r ON r.doc_id = s.doc_id
    ORDER BY s.doc_id"""

  // q149: q83's bigram-LM scoring CTEs verbatim, then the CCNet cut — the
  // per-language ntile(3) over the (ce, doc_id) total order and the
  // keep = not-tail flag. Only docs with >= 1 token rank (q83's sc gate);
  // lang rides from the t CTE.
  val q149 = """
    WITH t AS (SELECT doc_id, lang,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    uni AS (SELECT w, count(*) AS cu
            FROM (SELECT unnest(toks) AS w FROM t WHERE lang = 'en') GROUP BY w),
    tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM uni),
    bg AS (SELECT doc_id, lang, toks[i-1] AS w1, toks[i] AS w2
           FROM t, unnest(generate_series(2, len(toks))) AS u(i)),
    bi AS (SELECT w1, w2, count(*) AS cb FROM bg WHERE lang = 'en' GROUP BY w1, w2),
    sc AS (SELECT doc_id, lang, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
    frst AS (SELECT s.doc_id,
                -ln((CAST(coalesce(u.cu, 0) AS DOUBLE) + 1.0) / (tot.t + tot.v)) AS h1
              FROM sc s LEFT JOIN uni u ON u.w = s.toks[1] CROSS JOIN tot),
    rest AS (SELECT doc_id, sum(h) AS hrest FROM (
               SELECT g.doc_id,
                 -ln((CAST(coalesce(b.cb, 0) AS DOUBLE) + 1.0) /
                     (CAST(coalesce(u.cu, 0) AS DOUBLE) + tot.v)) AS h
               FROM bg g
               LEFT JOIN bi b ON b.w1 = g.w1 AND b.w2 = g.w2
               LEFT JOIN uni u ON u.w = g.w1
               CROSS JOIN tot) GROUP BY doc_id),
    ce AS (SELECT s.doc_id, s.lang, CAST(s.n AS BIGINT) AS n_tokens,
             round((f.h1 + coalesce(r.hrest, 0.0)) / CAST(s.n AS DOUBLE), 6) AS ce
           FROM sc s JOIN frst f ON f.doc_id = s.doc_id
           LEFT JOIN rest r ON r.doc_id = s.doc_id),
    bk AS (SELECT doc_id, lang, n_tokens, ce,
             CAST(ntile(3) OVER (PARTITION BY lang ORDER BY ce, doc_id)
                  AS BIGINT) AS bucket
           FROM ce)
    SELECT doc_id, lang, n_tokens, ce, bucket,
           CAST(CASE WHEN bucket < 3 THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM bk ORDER BY doc_id"""

  // Duplicated-span stats, FULL replay: every positional 5-token span is
  // regenerated as a STRING (Spark ships xxhash64 fingerprints — a
  // collision there would produce extra dup marks and hash-break here),
  // global occurrence counts, the ≥2 dup join, and the interval-union
  // token coverage (list_distinct over flattened generate_series = Spark's
  // array_distinct over flattened sequence) all recomputed; seven columns
  // hash-compared per doc including zero-span short docs.
  val q84 = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
    sp AS (SELECT doc_id, i AS s, array_to_string(toks[i:i+4], ' ') AS sh
           FROM base, unnest(generate_series(1, n_tokens - 4)) AS u(i)
           WHERE n_tokens >= 5),
    cnt AS (SELECT sh, count(*) AS c FROM sp GROUP BY sh),
    ds AS (SELECT sp.doc_id, sp.s FROM sp JOIN cnt ON cnt.sh = sp.sh WHERE cnt.c >= 2),
    agg AS (SELECT doc_id, count(*) AS n_dup,
                   len(list_distinct(flatten(list_transform(list(s), x -> generate_series(x, x + 4))))) AS covered
            FROM ds GROUP BY doc_id),
    spn AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id)
    SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(spn.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(agg.n_dup, 0) AS BIGINT) AS n_dup,
           round(CASE WHEN coalesce(spn.n_spans, 0) = 0 THEN 0.0
                 ELSE CAST(coalesce(agg.n_dup, 0) AS DOUBLE) / CAST(spn.n_spans AS DOUBLE) END, 6) AS dup_frac,
           CAST(coalesce(agg.covered, 0) AS BIGINT) AS covered,
           round(CASE WHEN b.n_tokens = 0 THEN 0.0
                 ELSE CAST(coalesce(agg.covered, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) END, 6) AS covered_frac
    FROM base b LEFT JOIN spn ON spn.doc_id = b.doc_id
    LEFT JOIN agg ON agg.doc_id = b.doc_id
    ORDER BY b.doc_id"""

  // BM25 top-20, FULL replay: per-doc tf via list_filter (= Spark's array
  // filter — no tokenizer divergence possible), corpus stats N/avgdl/df
  // from one aggregate, the identical left-to-right 3-term sum with the
  // Lucene idf, and the (rounded bm25 DESC, doc_id) LIMIT cut — the
  // k-boundary membership is hash-compared, not just the scores. Constants
  // inline: k1=1.2, b=0.75 => tf factor 2.2, length norm 0.25+0.75*dl/avgdl.
  val q85 = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    w AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
            CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf0,
            CAST(len(list_filter(toks, x -> x = 'filter')) AS DOUBLE) AS tf1,
            CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf2
          FROM t),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM w)
    SELECT doc_id,
           round(ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
    FROM w, st
    WHERE greatest(tf0, tf1, tf2) > 0
    ORDER BY bm25 DESC, doc_id LIMIT 20"""

  // Duplicated-segment removal, FULL replay: segments regenerated as
  // strings (Spark-side xxhash64 collisions would hash-break), distinct-doc
  // frequency, drop set, and the reassembled text all recomputed; the
  // kept_md5 digest compares CONTENT and order, not just counts.
  val q86 = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    b AS (SELECT doc_id, len(toks) AS n_tokens,
                 CAST(ceil(len(toks) / 8.0) AS BIGINT) AS n_segments, toks
          FROM t),
    seg AS (SELECT doc_id, i AS si, array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS s
            FROM b, unnest(generate_series(0, CAST(n_segments AS INTEGER) - 1)) AS u(i)
            WHERE n_segments > 0),
    f AS (SELECT s FROM seg GROUP BY s HAVING count(DISTINCT doc_id) > 1),
    dr AS (SELECT seg.doc_id, list(DISTINCT si) AS drop_idx
           FROM seg JOIN f ON f.s = seg.s GROUP BY seg.doc_id),
    k AS (SELECT b.doc_id, b.n_tokens, b.n_segments,
                 coalesce(len(dr.drop_idx), 0) AS n_dropped,
                 coalesce(flatten(list_transform(
                   list_filter(generate_series(0, CAST(b.n_segments AS INTEGER) - 1),
                               i -> NOT list_contains(coalesce(dr.drop_idx, []::BIGINT[]), i)),
                   i -> b.toks[(i*8+1):(i*8+8)])), []::VARCHAR[]) AS kept
          FROM b LEFT JOIN dr ON dr.doc_id = b.doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_segments AS BIGINT) AS n_segments,
           CAST(n_dropped AS BIGINT) AS n_dropped_segments,
           CAST(len(kept) AS BIGINT) AS n_kept_tokens,
           md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
    FROM k ORDER BY doc_id"""

  // Quality-classifier gate: fold sizes replayed exactly from the q76
  // md5-uniform split (sf-independent); the held-out accuracy flag is
  // pinned — DuckDB cannot train the model, but the planted label is
  // linearly recoverable, so a correct pipeline always clears the gate.
  val q87 = """
    WITH u AS (
      SELECT doc_id, list_reduce(list_prepend(0.0,
          list_transform(generate_series(1, 13),
            k -> CAST(strpos('0123456789abcdef',
                   substr(substr(md5(concat_ws('|', doc_id, 'split')), 1, 13), k, 1)) - 1 AS DOUBLE)
                 * pow(16.0, 13 - k))),
        (a, x) -> a + x) / 4503599627370496.0 AS u
      FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN u < 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN u >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           CAST(1 AS BIGINT) AS acc_ok
    FROM u"""

  // q137: trained char-n-gram language ID — the q87 posture, PER CLASS:
  // the planted language is doc_id mod 5, the folds are the same md5-
  // uniform split arithmetic, and every class's held-out recall flag is
  // pinned (the planted phrase makes each class linearly recoverable, so
  // a correct n-gram sweep + hasher + multinomial fit always clears it).
  val q137 = """
    WITH u AS (
      SELECT doc_id, list_reduce(list_prepend(0.0,
          list_transform(generate_series(1, 13),
            k -> CAST(strpos('0123456789abcdef',
                   substr(substr(md5(concat_ws('|', doc_id, 'split')), 1, 13), k, 1)) - 1 AS DOUBLE)
                 * pow(16.0, 13 - k))),
        (a, x) -> a + x) / 4503599627370496.0 AS u,
        CASE CAST(doc_id % 5 AS INTEGER)
          WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
          WHEN 3 THEN 'fr' ELSE 'zh' END AS lang
      FROM documents)
    SELECT lang,
           CAST(sum(CASE WHEN u < 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN u >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           CAST(1 AS BIGINT) AS recall_ok
    FROM u GROUP BY lang ORDER BY lang"""

  // (q88's token-budget oracle is q88bpe below — the per-domain available
  // tokens moved from the BPE-ish heuristic to the real BPE count in
  // round 7.)

  // Token-entropy signals, FULL replay: tokenizer, per-(doc, token)
  // counts, entropy / normalized entropy / type-token ratio at 6 dp.
  val q90 = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    b AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
    c AS (SELECT doc_id, n_tokens, w, CAST(count(*) AS DOUBLE) AS c
          FROM b, unnest(toks) AS u(w)
          WHERE n_tokens > 0 GROUP BY doc_id, n_tokens, w),
    h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
                 sum(-(c / n_tokens) * ln(c / n_tokens)) AS H
          FROM c GROUP BY doc_id, n_tokens)
    SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           coalesce(h.n_distinct, 0) AS n_distinct,
           round(coalesce(h.H, 0.0), 6) AS entropy,
           round(CASE WHEN coalesce(h.n_distinct, 0) > 1
                 THEN coalesce(h.H, 0.0) / ln(CAST(h.n_distinct AS DOUBLE))
                 ELSE 0.0 END, 6) AS norm_entropy,
           round(CASE WHEN b.n_tokens > 0
                 THEN CAST(coalesce(h.n_distinct, 0) AS DOUBLE) / b.n_tokens
                 ELSE 0.0 END, 6) AS distinct_frac
    FROM b LEFT JOIN h ON h.doc_id = b.doc_id
    ORDER BY b.doc_id"""

  // Ordered funnel, FULL replay via the k-pass definition: t1 = min view,
  // t2 = min click strictly after t1, t3 = min purchase strictly after t2.
  // The Spark side computes the same times with a sorted per-user fold.
  val q91 = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
    u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e
           JOIN s1 ON s1.user_id = e.user_id
           WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e
           JOIN s2 ON s2.user_id = e.user_id
           WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed,
           coalesce(t1, -1) AS first_us,
           coalesce(t3, t2, t1, -1) AS last_us,
           CASE WHEN t3 IS NOT NULL THEN t3 - t1 ELSE -1 END AS convert_us
    FROM u LEFT JOIN s1 ON s1.user_id = u.user_id
    LEFT JOIN s2 ON s2.user_id = u.user_id
    LEFT JOIN s3 ON s3.user_id = u.user_id
    ORDER BY u.user_id"""

  // Retention cohorts, FULL replay: cohort day = min event date per user,
  // activity collapsed to distinct (user, day), ratio at 6 dp.
  val q92 = """
    WITH b AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
    c AS (SELECT user_id, min(day) AS cohort_day FROM b GROUP BY user_id),
    s AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_cohort
          FROM c GROUP BY cohort_day),
    a AS (SELECT c.cohort_day,
                 CAST(datediff('day', c.cohort_day, d.day) AS BIGINT) AS offset_days,
                 CAST(count(*) AS BIGINT) AS n_active
          FROM (SELECT DISTINCT user_id, day FROM b) d
          JOIN c ON c.user_id = d.user_id
          GROUP BY c.cohort_day, datediff('day', c.cohort_day, d.day))
    SELECT CAST(a.cohort_day AS VARCHAR) AS cohort_day, a.offset_days,
           a.n_active, s.n_cohort,
           round(CAST(a.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
    FROM a JOIN s ON s.cohort_day = a.cohort_day
    ORDER BY cohort_day, offset_days"""

  // Perceptual-hash image dedup, FULL replay from the raw table: pixel
  // synthesis, twin planting, integer-mean aHash bits, and ALL-PAIRS
  // Hamming at radius 4 (the Spark side uses MIH blocking — a recall miss
  // drops a row and breaks the hash).
  val q93 = """
    WITH px AS (SELECT l_suppkey AS sk, l_orderkey AS o, l_linenumber AS ln,
                       l_partkey AS pk,
                       CAST(floor(l_extendedprice) AS BIGINT) % 256 AS p
                FROM lineitem),
    r AS (SELECT sk, p,
                 row_number() OVER (PARTITION BY sk ORDER BY o, ln, pk, p) AS rn
          FROM px),
    im AS (SELECT sk AS img, list(p ORDER BY rn) AS ps
           FROM r WHERE rn <= 64 GROUP BY sk HAVING count(*) = 64),
    tw AS (SELECT img + 100000 AS img,
                  list_transform(ps, x -> least(x + 4, 255)) AS ps
           FROM im WHERE img % 4 = 0),
    ai AS (SELECT * FROM im UNION ALL SELECT * FROM tw),
    h AS (SELECT img, list_transform(ps,
                   x -> CASE WHEN x > list_sum(ps) // 64 THEN 1 ELSE 0 END) AS bits
          FROM ai)
    SELECT a.img AS id_a, b.img AS id_b,
           CAST(len(list_filter(generate_series(1, 64),
                i -> a.bits[i] <> b.bits[i])) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.img < b.img
    WHERE len(list_filter(generate_series(1, 64),
          i -> a.bits[i] <> b.bits[i])) <= 4
    ORDER BY id_a, id_b"""

  // Trailing-bucket z-score anomalies, FULL replay: hour buckets, avg /
  // var_pop baselines, +1h shift join, z at 6 dp, threshold flag.
  val q94 = """
    WITH e AS (SELECT event_id, event_type AS key,
                      date_trunc('hour', ts) AS b, value FROM events),
    st AS (SELECT key, b + INTERVAL 1 HOUR AS b, avg(value) AS mu,
                  var_pop(value) AS v, CAST(count(*) AS BIGINT) AS n
           FROM e GROUP BY key, b)
    SELECT e.event_id, e.key, epoch_us(st.b) AS bucket_us, e.value,
           round(CASE WHEN st.v > 0 THEN (e.value - st.mu) / sqrt(st.v)
                 ELSE 0.0 END, 6) AS z,
           CAST(CASE WHEN st.v > 0 AND
                     abs((e.value - st.mu) / sqrt(st.v)) > 3.0
                THEN 1 ELSE 0 END AS BIGINT) AS is_anom,
           st.n AS baseline_n
    FROM e JOIN st ON st.key = e.key AND st.b = e.b
    ORDER BY e.event_id"""

  // Audio envelope-fingerprint dedup, FULL replay: samples, integer window
  // energies, transition bits, and ALL-PAIRS Hamming at radius 2.
  val q95 = """
    WITH px AS (SELECT l_suppkey AS sk, l_orderkey AS o, l_linenumber AS ln,
                       l_partkey AS pk,
                       CAST(floor(l_extendedprice) AS BIGINT) % 16000 - 8000 AS q
                FROM lineitem),
    r AS (SELECT sk, q,
                 row_number() OVER (PARTITION BY sk ORDER BY o, ln, pk, q) AS rn
          FROM px),
    cl AS (SELECT sk AS clip, list(q ORDER BY rn) AS qs
           FROM r GROUP BY sk HAVING count(*) >= 33),
    tw AS (SELECT clip + 200000 AS clip, list_transform(qs, x -> x * 2) AS qs
           FROM cl WHERE clip % 4 = 1),
    ac AS (SELECT * FROM cl UNION ALL SELECT * FROM tw),
    en AS (SELECT clip, list_transform(generate_series(0, 32),
                    k -> list_sum(list_transform(
                      qs[(k * (len(qs) // 33) + 1):(k * (len(qs) // 33) + (len(qs) // 33))],
                      x -> x * x))) AS e
           FROM ac),
    h AS (SELECT clip, list_transform(generate_series(1, 32),
                   i -> CASE WHEN e[i + 1] > e[i] THEN 1 ELSE 0 END) AS bits
          FROM en)
    SELECT a.clip AS id_a, b.clip AS id_b,
           CAST(len(list_filter(generate_series(1, 32),
                i -> a.bits[i] <> b.bits[i])) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.clip < b.clip
    WHERE len(list_filter(generate_series(1, 32),
          i -> a.bits[i] <> b.bits[i])) <= 2
    ORDER BY id_a, id_b"""

  // Windowed funnel (6 h = 21_600_000_000 µs): the q91 k-pass replay with
  // the window bound t_i <= t1 + W on every later step.
  val q96 = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
    u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(s1.t1) AS t1, min(ts) AS t2 FROM e
           JOIN s1 ON s1.user_id = e.user_id
           WHERE event_type = 'click' AND ts > t1
             AND ts <= t1 + 21600000000 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e
           JOIN s2 ON s2.user_id = e.user_id
           WHERE event_type = 'purchase' AND ts > t2
             AND ts <= t1 + 21600000000 GROUP BY e.user_id)
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed,
           coalesce(s1.t1, -1) AS first_us,
           coalesce(t3, t2, s1.t1, -1) AS last_us,
           CASE WHEN t3 IS NOT NULL THEN t3 - s1.t1 ELSE -1 END AS convert_us
    FROM u LEFT JOIN s1 ON s1.user_id = u.user_id
    LEFT JOIN s2 ON s2.user_id = u.user_id
    LEFT JOIN s3 ON s3.user_id = u.user_id
    ORDER BY u.user_id"""

  // Neyman-allocation stratified sample, FULL replay: stddev_pop, the
  // floor allocation, the md5-uniform ranked selection (q76 device, salt
  // 'neyman'), and the per-stratum sorted-id digest.
  val q97 = """
    WITH v AS (SELECT lang AS stratum, doc_id, CAST(n_chars AS DOUBLE) AS x
               FROM documents),
    s AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_pop,
                 coalesce(stddev_pop(x), 0.0) AS sig
          FROM v GROUP BY stratum),
    w AS (SELECT *, n_pop * sig AS wh FROM s),
    tot AS (SELECT sum(wh) AS wsum FROM w),
    a AS (SELECT stratum, n_pop, sig,
                 CASE WHEN wsum > 0
                 THEN least(n_pop, CAST(floor(200.0 * wh / wsum) AS BIGINT))
                 ELSE 0 END AS n_alloc
          FROM w, tot),
    u AS (SELECT stratum, doc_id, list_reduce(list_prepend(0.0,
            list_transform(generate_series(1, 13),
              k -> CAST(strpos('0123456789abcdef',
                     substr(substr(md5(concat_ws('|', doc_id, 'neyman')), 1, 13), k, 1)) - 1 AS DOUBLE)
                   * pow(16.0, 13 - k))),
          (acc, y) -> acc + y) / 4503599627370496.0 AS u
          FROM v),
    r AS (SELECT stratum, doc_id,
                 row_number() OVER (PARTITION BY stratum ORDER BY u, doc_id) AS rn
          FROM u),
    sel AS (SELECT r.stratum, CAST(count(*) AS BIGINT) AS n_selected,
                   md5(array_to_string(list_sort(list(r.doc_id)), ',')) AS sel_md5
            FROM r JOIN a ON a.stratum = r.stratum
            WHERE r.rn <= a.n_alloc GROUP BY r.stratum)
    SELECT a.stratum, a.n_pop, round(a.sig, 6) AS sigma, a.n_alloc,
           coalesce(sel.n_selected, 0) AS n_selected,
           coalesce(sel.sel_md5, md5('')) AS sel_md5
    FROM a LEFT JOIN sel ON sel.stratum = a.stratum
    ORDER BY a.stratum"""

  // Rendezvous sharding, FULL replay: the md5 argmax for both shard
  // counts, per row.
  val q98 = """
    WITH a AS (SELECT doc_id,
                 CAST(list_sort(list_transform(generate_series(0, 7),
                   s -> {'h': md5(concat_ws('|', doc_id, 'hrw', s)), 's': s}),
                   'DESC')[1].s AS BIGINT) AS shard8,
                 CAST(list_sort(list_transform(generate_series(0, 8),
                   s -> {'h': md5(concat_ws('|', doc_id, 'hrw', s)), 's': s}),
                   'DESC')[1].s AS BIGINT) AS shard9
               FROM documents)
    SELECT doc_id, shard8, shard9,
           CAST(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END AS BIGINT) AS moved
    FROM a ORDER BY doc_id"""

  // Salted-join gate: the oracle is the PLAIN join — salting must be
  // invisible in the aggregated result.
  val q99 = """
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey ORDER BY s.s_nationkey"""

  // Explainable-curation audit: the q66 stage CTEs, assembled per input
  // doc into gate verdicts (-1 = never reached), kept, and first reason.
  val q100 = s"""
    $curationPrefix
    SELECT c.doc_id,
           CAST(CASE WHEN p1.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS rule_pass,
           CAST(CASE WHEN p1.doc_id IS NULL THEN -1 WHEN p2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS rep_pass,
           CAST(CASE WHEN p2.doc_id IS NULL THEN -1 WHEN p3.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS exact_keeper,
           CAST(CASE WHEN p3.doc_id IS NULL THEN -1 WHEN p4.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS near_keeper,
           CAST(CASE WHEN p4.doc_id IS NULL THEN -1 WHEN p5.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS contaminated,
           CAST(CASE WHEN p4.doc_id IS NOT NULL AND p5.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
           CASE WHEN p1.doc_id IS NULL THEN 'rules'
                WHEN p2.doc_id IS NULL THEN 'repetition'
                WHEN p3.doc_id IS NULL THEN 'exact_dup'
                WHEN p4.doc_id IS NULL THEN 'near_dup'
                WHEN p5.doc_id IS NOT NULL THEN 'contaminated'
                ELSE 'kept' END AS reason
    FROM corpus c
    LEFT JOIN s1 p1 ON p1.doc_id = c.doc_id
    LEFT JOIN s2 p2 ON p2.doc_id = c.doc_id
    LEFT JOIN s3 p3 ON p3.doc_id = c.doc_id
    LEFT JOIN s4 p4 ON p4.doc_id = c.doc_id
    LEFT JOIN contam p5 ON p5.doc_id = c.doc_id
    ORDER BY c.doc_id"""

  // RAG chunk retrieval: the q78 chunk derivation feeding the q85 BM25
  // arithmetic over CHUNKS (composite id = doc*1000000 + chunk), k-boundary
  // included.
  val q101 = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    c AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    nc AS (SELECT *, CASE WHEN n <= 0 THEN 0
                     ELSE 1 + greatest(0, CAST(ceil((n - 64) / 32.0) AS INTEGER))
                     END AS nchunks FROM c),
    ex AS (SELECT doc_id, toks, unnest(range(nchunks)) AS chunk_id
           FROM nc WHERE nchunks > 0),
    x AS (SELECT doc_id * 1000000 + chunk_id AS cid,
                 toks[(chunk_id * 32 + 1):(chunk_id * 32 + 64)] AS chunk
          FROM ex),
    w AS (SELECT cid, CAST(len(chunk) AS DOUBLE) AS dl,
            CAST(len(list_filter(chunk, y -> y = 'join')) AS DOUBLE) AS tf0,
            CAST(len(list_filter(chunk, y -> y = 'filter')) AS DOUBLE) AS tf1,
            CAST(len(list_filter(chunk, y -> y = 'window')) AS DOUBLE) AS tf2
          FROM x),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM w),
    sc AS (SELECT cid,
             round(ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                 + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                 + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
           FROM w, st
           WHERE greatest(tf0, tf1, tf2) > 0
           ORDER BY bm25 DESC, cid LIMIT 20)
    SELECT CAST(cid // 1000000 AS BIGINT) AS doc_id,
           CAST(cid % 1000000 AS BIGINT) AS chunk_id, bm25
    FROM sc ORDER BY bm25 DESC, doc_id, chunk_id"""

  // Per-group percent-rank via the range-partitioned grouped rank: the
  // plain window is the semantic oracle.
  val q102 = """
    WITH r AS (SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS ng
               FROM documents)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rn AS BIGINT) AS rn,
           round(CASE WHEN ng > 1 THEN (rn - 1.0) / (ng - 1.0)
                 ELSE 0.0 END, 6) AS pct_rank
    FROM r ORDER BY doc_id"""

  /** q103: real BPE tokenization — training AND encoding replayed as an
    * UNROLLED CTE chain (one pair-count + argmax + replace trio per merge
    * iteration, generated programmatically), over the same wrapped-symbol
    * device the Spark side uses ("abc" → "|a||b||c|"; applying merge (l,r)
    * = replace("|l||r|" → "|lr|"), whose left-to-right non-overlapping
    * scan is BPE's greedy application in both engines). chr(1) is the
    * never-matching replace pattern when an iteration finds no pair left
    * (both sides then emit no merge row and leave words unchanged).
    * Every chain CTE is MATERIALIZED: s_i is referenced twice (y_{i+1} and
    * s_{i+1}), so DuckDB's default inlining would double the plan tree per
    * iteration — 2^40 scans ("too many open files") instead of 40. */
  def bpeOracle(nMerges: Int): String =
    s"""
    WITH ${bpeChainCtes(nMerges)},
    d3 AS MATERIALIZED (SELECT doc_id, wpos, j, syms[j] AS sym
           FROM (SELECT doc_id, wpos, syms,
                   unnest(generate_series(1, len(syms))) AS j
                 FROM d3a)),
    d4 AS (SELECT doc_id, sym,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, j) AS BIGINT) AS pos
           FROM d3),
    vocab AS (SELECT sym, CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS id
              FROM (SELECT DISTINCT sym FROM d3)),
    docrows AS (SELECT 'doc' AS kind, CAST(doc_id AS BIGINT) AS key,
                  '' AS lft, '' AS rgt,
                  CAST(count(*) AS BIGINT) AS n1, CAST(sum(id) AS BIGINT) AS n2,
                  CAST(sum(pos * id) AS BIGINT) AS n3
                FROM d4 JOIN vocab USING (sym) GROUP BY doc_id)
    SELECT * FROM (${bpeMergeRowsSql(nMerges)} UNION ALL SELECT * FROM docrows)
    ORDER BY kind, key"""

  private def bpeMergeRowsSql(nMerges: Int): String =
    (1 to nMerges).map { i =>
      s"""SELECT 'merge' AS kind, CAST($i AS BIGINT) AS key, l AS lft, r AS rgt,
          cnt AS n1, CAST(0 AS BIGINT) AS n2, CAST(0 AS BIGINT) AS n3 FROM b$i"""
    }.mkString(" UNION ALL ")

  /** The shared training-and-encoding CTE chain: d0/d1 (normalized docs →
    * token arrays), w0/s0 (distinct-word freq, wrapped), the per-iteration
    * y/p/b/s quartets, wsym (final symbols per word), d2 (per-doc word
    * positions), d3a (those joined to their symbol arrays), and bcnt (the
    * per-doc REAL BPE token count). q103 hangs digests off it; q61/q88
    * hang their budget arithmetic off bcnt. */
  private def bpeChainCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """d0 AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS norm
                FROM documents),
    d1 AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(norm, '\s+') AS toks
           FROM d0 WHERE length(norm) > 0),
    w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(toks) AS word FROM d1) GROUP BY word),
    s0 AS MATERIALIZED (SELECT word, regexp_replace(word, '(.)', '|\1|', 'g') AS w, freq FROM w0)"""
    for (i <- 1 to nMerges) {
      sb ++= s""",
    y$i AS (SELECT freq, str_split(substring(w, 2, length(w) - 2), '||') AS syms
            FROM s${i - 1}),
    p$i AS (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
            FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
                  FROM y$i WHERE len(syms) >= 2)
            GROUP BY 1, 2),
    b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
    s$i AS MATERIALIZED (SELECT word,
              replace(w,
                coalesce((SELECT '|' || l || '||' || r || '|' FROM b$i), chr(1)),
                coalesce((SELECT '|' || l || r || '|' FROM b$i), '')) AS w,
              freq
            FROM s${i - 1})"""
    }
    sb ++= s""",
    wsym AS (SELECT word, str_split(substring(w, 2, length(w) - 2), '||') AS syms
             FROM s$nMerges),
    d2 AS (SELECT doc_id, i AS wpos, toks[i] AS word
           FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
                 FROM d1)),
    d3a AS MATERIALIZED (SELECT d2.doc_id, d2.wpos, wsym.syms
            FROM d2 JOIN wsym USING (word)),
    bcnt AS (SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS btok
             FROM d3a GROUP BY doc_id)"""
    sb.toString
  }

  val q103: String = bpeOracle(40)

  /** q143: byte-level BPE — the full GPT-2-family replay. Pretokenize the
    * RAW (planted) text with the RE2-safe GPT-2 pattern + the
    * lookahead fix-up (an all-space run of length w ≥ 2 followed by a
    * token donates its last space: the run shrinks to w-1 and the next
    * token gains the ' ' prefix — verified token-for-token against
    * java.util.regex's lookahead semantics for this corpus shape, where
    * multi-space runs are always space-only and letter-followed), byte-map
    * every distinct pretoken through the GPT-2 byte→unicode bijection
    * (hex-digit byte extraction + the CASE bijection + chr), then run the
    * EXACT q103 merge-chain replay with chr(1) as the symbol separator
    * (the byte alphabet contains '|') and chr(2) as the never-matching
    * fallback. Digests: merge rows + per-doc (count, id-sum, pos-weighted
    * id-sum) against the binary-collation symbol vocabulary. */
  def byteBpeOracle(nMerges: Int, plantSqlLiteral: String): String = {
    val pat = """''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""
    val sb = new StringBuilder
    sb ++= s"""
    WITH d0 AS (SELECT doc_id,
             rtrim(coalesce(text, '')) || '$plantSqlLiteral' ||
               CAST(doc_id % 7 AS VARCHAR) || chr(32) AS raw
           FROM documents),
    tk0 AS (SELECT doc_id, regexp_extract_all(raw, '$pat') AS tks FROM d0),
    tk1 AS (SELECT doc_id, i, tks[i] AS t0, len(tks) AS nt
            FROM tk0, unnest(generate_series(1, len(tks))) AS u(i)),
    tk2 AS MATERIALIZED (SELECT doc_id, i AS wpos,
            CASE WHEN regexp_matches(t0, '^ {2,}$$') AND i < nt
                   THEN substr(t0, 1, length(t0) - 1)
                 WHEN lag(t0) OVER w IS NOT NULL
                   AND regexp_matches(lag(t0) OVER w, '^ {2,}$$')
                   THEN ' ' || t0
                 ELSE t0 END AS word
            FROM tk1 WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
    w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM tk2 GROUP BY word),
    wb AS (SELECT word, k,
             (strpos('0123456789abcdef',
                substr(lower(hex(encode(word))), 2*k-1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                substr(lower(hex(encode(word))), 2*k, 1)) - 1) AS b
           FROM w0, unnest(generate_series(1, strlen(word))) AS u(k)),
    wm AS MATERIALIZED (SELECT word,
             string_agg(chr(1) || chr(CAST(CASE
               WHEN (b BETWEEN 33 AND 126) OR (b BETWEEN 161 AND 172)
                    OR (b BETWEEN 174 AND 255) THEN b
               WHEN b <= 32 THEN 256 + b
               WHEN b BETWEEN 127 AND 160 THEN 256 + 33 + b - 127
               ELSE 256 + 67 END AS INTEGER)) || chr(1), '' ORDER BY k) AS w
           FROM wb GROUP BY word),
    s0 AS MATERIALIZED (SELECT wm.word, wm.w, w0.freq
           FROM wm JOIN w0 USING (word))"""
    for (i <- 1 to nMerges) {
      sb ++= s""",
    y$i AS (SELECT freq, str_split(substring(w, 2, length(w) - 2),
                     chr(1) || chr(1)) AS syms
            FROM s${i - 1}),
    p$i AS (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
            FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
                  FROM y$i WHERE len(syms) >= 2)
            GROUP BY 1, 2),
    b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
    s$i AS MATERIALIZED (SELECT word,
              replace(w,
                coalesce((SELECT chr(1) || l || chr(1) || chr(1) || r || chr(1)
                          FROM b$i), chr(2)),
                coalesce((SELECT chr(1) || l || r || chr(1) FROM b$i), '')) AS w,
              freq
            FROM s${i - 1})"""
    }
    sb ++= s""",
    wsym AS (SELECT word, str_split(substring(w, 2, length(w) - 2),
                      chr(1) || chr(1)) AS syms
             FROM s$nMerges),
    d3a AS MATERIALIZED (SELECT tk2.doc_id, tk2.wpos, wsym.syms
            FROM tk2 JOIN wsym USING (word)),
    d3 AS MATERIALIZED (SELECT doc_id, wpos, j, syms[j] AS sym
           FROM (SELECT doc_id, wpos, syms,
                   unnest(generate_series(1, len(syms))) AS j
                 FROM d3a)),
    d4 AS (SELECT doc_id, sym,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, j) AS BIGINT) AS pos
           FROM d3),
    vocab AS (SELECT sym, CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS id
              FROM (SELECT DISTINCT sym FROM d3)),
    docrows AS (SELECT 'doc' AS kind, CAST(doc_id AS BIGINT) AS key,
                  '' AS lft, '' AS rgt,
                  CAST(count(*) AS BIGINT) AS n1, CAST(sum(id) AS BIGINT) AS n2,
                  CAST(sum(pos * id) AS BIGINT) AS n3
                FROM d4 JOIN vocab USING (sym) GROUP BY doc_id)
    SELECT * FROM (${bpeMergeRowsSql(nMerges)} UNION ALL SELECT * FROM docrows)
    ORDER BY kind, key"""
    sb.toString
  }

  val q143: String = {
    // SQL-escape the plant; the map-build normalization collapses every
    // whitespace run in oracle SQL to one space, so the plant's
    // significant DOUBLE space ships as chr(32) concatenation instead
    val esc = graft.queries.Queries.Gpt2Plant.replace("'", "''")
      .replace("  ", "' || chr(32) || chr(32) || '")
    byteBpeOracle(40, esc)
  }

  /** q139: mp3 fingerprint dedup — the pair list and the 32-bit arithmetic
    * envelope fingerprint replayed from the supplier table. Planted twins
    * are ×2-amplitude copies (suppkey % 4 = 1, id + 200000) that collide
    * at Hamming 0 THROUGH the lossy codec (exact global_gain+4 linearity);
    * the Spark side's decode-derived pairing must emit exactly these rows,
    * and `ah_a` pins the Knuth-hash-driven transition bits: odd windows
    * carry hash bit (w-1)/2, even windows return to MID (inverted bit). */
  val q139: String = """
    WITH t AS (SELECT CAST(s_suppkey AS BIGINT) AS s,
                      (CAST(s_suppkey AS BIGINT) * 2654435761) % 4294967296 AS h
               FROM supplier WHERE s_suppkey % 4 = 1),
    bits AS (SELECT s, w,
                    CASE WHEN w % 2 = 1 THEN (h >> CAST((w - 1) // 2 AS INT)) & 1
                         ELSE 1 - ((h >> CAST((w - 2) // 2 AS INT)) & 1) END AS b
             FROM t, (SELECT unnest(generate_series(1, 32)) AS w)),
    ah AS (SELECT s, CAST(sum(b * (1::BIGINT << CAST(w - 1 AS INT))) AS BIGINT) AS ah_a
           FROM bits GROUP BY s)
    SELECT s AS id_a,
           s + 200000 AS id_b,
           CAST(0 AS BIGINT) AS hamming,
           ah_a,
           CAST(1 AS BIGINT) AS a_ok,
           CAST(1 AS BIGINT) AS b_ok
    FROM ah ORDER BY id_a"""

  /** q140: the WARC/WET round-trip gate — digests of the parquet original;
    * the WARC read (gzip member framing, header parse, Content-Length
    * slice, UTF-8 content) must reproduce them exactly. `strlen` is the
    * UTF-8 OCTET length, matching the WARC Content-Length contract. */
  val q140: String = """
    SELECT doc_id, strlen(coalesce(text, '')) AS content_length,
           md5(coalesce(text, '')) AS text_md5
    FROM documents ORDER BY doc_id"""

  /** q142: Doulion triangle estimate — full replay: canonical co-purchase
    * edges, the 13-hex md5-uniform keep decision per edge (q76 device over
    * 'u:v|doulion'), an exact a<b<c triple-join triangle count on the kept
    * subgraph, and the ×8 (= 1/p³ at p=1/2) scale-up under the 6-dp
    * fence. */
  val q142 = """
    WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
    e0 AS (SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
           FROM li x JOIN li y ON x.ok = y.ok AND x.l_partkey < y.l_partkey),
    s AS (SELECT u, v,
            CASE WHEN list_reduce(list_prepend(0.0,
                   list_transform(generate_series(1, 13),
                     k -> CAST(strpos('0123456789abcdef',
                            substr(substr(md5(concat_ws('|',
                              concat_ws(':', u, v), 'doulion')), 1, 13), k, 1))
                            - 1 AS DOUBLE) * pow(16.0, 13 - k))),
                   (a, x) -> a + x) / 4503599627370496.0 < 0.5
                 THEN 1 ELSE 0 END AS keep
          FROM e0),
    ke AS (SELECT u, v FROM s WHERE keep = 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS tri_sampled
          FROM ke e1 JOIN ke e2 ON e2.u = e1.v
                     JOIN ke e3 ON e3.u = e1.u AND e3.v = e2.v),
    es AS (SELECT CAST(count(*) AS BIGINT) AS total_edges,
                  CAST(sum(keep) AS BIGINT) AS kept_edges FROM s)
    SELECT es.total_edges, es.kept_edges, t.tri_sampled,
           floor(CAST(t.tri_sampled AS DOUBLE) / 0.125 * 1e6 + 0.5) / 1e6
             AS tri_est
    FROM es, t"""

  /** q144: raw-crawl HTML extraction — the expected title and visible
    * text built CLOSED-FORM from the documents table: the planted page
    * renders as (escaped text round-tripped back to the original) + the
    * decoded entity tail + the anchor/list lines; script/style/comment
    * content and every tag must vanish. NBSP (chr(160)) must survive the
    * per-line whitespace collapse; the decimal/hex references decode to
    * chr(8364)/chr(160). */
  val q144 = """
    SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           md5(ltrim(trim(coalesce(text, '')) || ' Fish & Chips <deal> ' ||
                 chr(8364) || '5 ' || chr(160) || 'now.') ||
               chr(10) || 'anchor text' ||
               chr(10) || 'item one' || chr(10) || 'item two') AS text_md5
    FROM documents ORDER BY doc_id"""

  /** q146: the crawl-to-corpus pipeline — the surviving cleaned line
    * rebuilt closed-form (the q144 page's content line, which alone
    * passes the C4 terminal-punct + min-words rules; the planted
    * boilerplate lines drop), the badsite.com blocklist predicate
    * (doc_id % 5 = 2), and the min-doc_id keeper election over the
    * surviving corpus. */
  val q146 = """
    WITH base AS (SELECT doc_id,
        ltrim(trim(coalesce(text, '')) || ' Fish & Chips <deal> ' ||
          chr(8364) || '5 ' || chr(160) || 'now.') AS pline
      FROM documents WHERE doc_id % 5 <> 2),
    k AS (SELECT pline, min(doc_id) AS keeper_id FROM base GROUP BY pline)
    SELECT b.doc_id, CAST(4 AS BIGINT) AS n_lines, CAST(1 AS BIGINT) AS n_kept,
           md5(b.pline) AS clean_md5, CAST(k.keeper_id AS BIGINT) AS keeper_id,
           CAST(CASE WHEN b.doc_id = k.keeper_id THEN 1 ELSE 0 END AS BIGINT)
             AS is_keeper
    FROM base b JOIN k USING (pline)
    ORDER BY b.doc_id"""

  /** q145: URL curation — the planted-URL construction (same doc_id
    * arithmetic as the Spark side, including the doc_id % 11 PSL-class
    * overrides) normalized by INDEPENDENT string ops: split on ://,
    * authority carve-out (stop at / ? #), host lowercase + port split,
    * default-port rule, path default, query param filter/sort via list
    * functions. No parse_url anywhere. The registered domain replays the
    * published PSL algorithm (exception > longest match > default `*`;
    * wildcard base matches one extra label) over the SAME rule tables as
    * [[graft.operators.Psl]] — the rule DATA is shared (it is public
    * data, not logic); the matching/string machinery is independent. */
  /** The planted-URL → normalized parts → PSL registered-domain CTE chain
    * shared by q145 (curation columns) and q155 (per-domain cap). */
  private def q145UrlCtes: String = s"""
    u AS (SELECT doc_id,
        CASE WHEN doc_id % 11 = 0 THEN 'https://deep.www.CK/x'
             WHEN doc_id % 11 = 1 THEN 'HTTP://shop.stores.example.ck:80/y?b=2&a=1'
             WHEN doc_id % 11 = 2 THEN 'https://www.City.gov.uk/services?utm_source=t'
             WHEN doc_id % 11 = 3 THEN 'http://district.k12.CA.us:8080/school'
             WHEN doc_id % 11 = 4 THEN 'https://metro.nagoya.jp'
             WHEN doc_id % 11 = 5 THEN 'http://www.city.Nagoya.jp/index#top'
             ELSE
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
        (CASE WHEN doc_id % 5 = 0 THEN 'News.Example.COM'
              WHEN doc_id % 5 = 1 THEN 'Blog.example.co.uk'
              WHEN doc_id % 5 = 2 THEN 'SPAM.badsite.com'
              WHEN doc_id % 5 = 3 THEN 'example.org'
              ELSE 'cdn.Site.com' END) ||
        (CASE WHEN doc_id % 3 = 0 THEN
                (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
              WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) ||
        (CASE WHEN doc_id % 7 = 0 THEN ''
              ELSE '/a/' || CAST(doc_id AS VARCHAR) END) ||
        (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&b=2&a=1'
              WHEN doc_id % 4 = 1 THEN '?b=2&a=1'
              WHEN doc_id % 4 = 2 THEN '?utm_campaign=z' ELSE '' END) ||
        (CASE WHEN doc_id % 2 = 1 THEN '#frag' ELSE '' END) END AS url
      FROM documents),
    parts AS (SELECT doc_id, url,
        lower(split_part(url, '://', 1)) AS scheme,
        split_part(url, '://', 2) AS rest
      FROM u),
    auth AS (SELECT *,
        split_part(split_part(split_part(rest, '/', 1), '?', 1), '#', 1)
          AS authority
      FROM parts),
    comps AS (SELECT doc_id, scheme,
        lower(split_part(authority, ':', 1)) AS h,
        CASE WHEN strpos(authority, ':') > 0
             THEN split_part(authority, ':', 2) ELSE '' END AS port,
        substr(rest, length(authority) + 1) AS afterauth
      FROM auth),
    norm0 AS (SELECT doc_id, scheme, h, port,
        CASE WHEN split_part(split_part(afterauth, '?', 1), '#', 1) = ''
             THEN '/' ELSE split_part(split_part(afterauth, '?', 1), '#', 1)
             END AS path,
        coalesce(array_to_string(list_sort(list_filter(
          str_split(CASE WHEN strpos(afterauth, '?') > 0
                         THEN split_part(split_part(afterauth, '?', 2), '#', 1)
                         ELSE '' END, '&'),
          x -> substr(x, 1, 4) <> 'utm_' AND x <> '')), '&'), '') AS q
      FROM comps),
    dom AS (SELECT doc_id, h,
        str_split(h, '.') AS labels, len(str_split(h, '.')) AS n
      FROM norm0),
    sfx AS (SELECT doc_id, h, labels, n,
        CASE WHEN n >= 1 THEN array_to_string(labels[n:n], '.') END AS s1,
        CASE WHEN n >= 2 THEN array_to_string(labels[n-1:n], '.') END AS s2,
        CASE WHEN n >= 3 THEN array_to_string(labels[n-2:n], '.') END AS s3,
        CASE WHEN n >= 4 THEN array_to_string(labels[n-3:n], '.') END AS s4
      FROM dom),
    psl AS (SELECT doc_id, h, labels, n,
        CASE WHEN n >= 3 AND s3 IN (${inList(graft.operators.Psl.exc3)}) THEN 2
             WHEN n >= 2 AND s2 IN (${inList(graft.operators.Psl.exc2)}) THEN 1
             WHEN n >= 4 AND s4 IN (${inList(graft.operators.Psl.exact4)}) THEN 4
             WHEN n >= 3 AND (s3 IN (${inList(graft.operators.Psl.exact3)})
                  OR s2 IN (${inList(graft.operators.Psl.wild2)})) THEN 3
             WHEN n >= 2 AND (s2 IN (${inList(graft.operators.Psl.exact2)})
                  OR s1 IN (${inList(graft.operators.Psl.wild1)})) THEN 2
             ELSE 1 END AS pslen
      FROM sfx),
    dom2 AS (SELECT doc_id,
        CASE WHEN n <= pslen THEN h
             ELSE array_to_string(labels[n-pslen:n], '.') END AS domain
      FROM psl)"""

  val q145 = s"""
    WITH $q145UrlCtes
    SELECT n.doc_id,
           n.scheme || '://' || n.h ||
           (CASE WHEN n.port = ''
                   OR (n.scheme = 'http' AND n.port = '80')
                   OR (n.scheme = 'https' AND n.port = '443') THEN ''
                 ELSE ':' || n.port END) ||
           n.path ||
           (CASE WHEN n.q = '' THEN '' ELSE '?' || n.q END) AS norm_url,
           d.domain,
           CAST(CASE WHEN d.domain = 'badsite.com' THEN 1 ELSE 0 END AS BIGINT)
             AS blocked
    FROM norm0 n JOIN dom2 d USING (doc_id)
    ORDER BY n.doc_id"""

  /** q155: per-domain cap — the PSL domain chain, then the 52-bit md5
    * coin per doc and a (h, doc_id)-ordered row_number per domain: kept
    * iff rank ≤ cap (20). Replays Urls.domainCap's bounded bottom-k
    * selection as an explicit window rank. */
  val q155: String = {
    val h = md5Int52("concat_ws('|', doc_id, 'domain-cap')")
    s"""
    WITH $q145UrlCtes,
    hh AS (SELECT doc_id, domain, $h AS h FROM dom2),
    rk AS (SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain ORDER BY h, doc_id) AS r
           FROM hh)
    SELECT doc_id, domain,
           CAST(CASE WHEN r <= 20 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM rk ORDER BY doc_id"""
  }

  /** q156: robots.txt verdicts — every planted rule semantics replayed
    * closed-form from the doc_id arithmetic (the q144/q146 convention:
    * the fixture construction IS the spec, so the expected verdict per
    * residue class is derivable by hand and encoded directly):
    * example.com = longest-match + allow-wins-tie on the `/a/1` pair
    * (first digit 1 → allowed); example.co.uk = the GraftBot group only
    * (star group shadowed), the `/a/` + `*1$` pattern matching any target that starts
    * `/a/` and ENDS in `1` — which includes the `…a=1` query tails, and
    * the bare path only when the id's last digit is 1; badsite.com =
    * blanket disallow; example.org = `Allow: /a/` for the
    * case-insensitive graftbot head; site.com = no robots → allowed. */
  val q156 = """
    WITH t AS (SELECT doc_id,
        CASE WHEN doc_id % 5 = 0 THEN 'example.com'
             WHEN doc_id % 5 = 1 THEN 'example.co.uk'
             WHEN doc_id % 5 = 2 THEN 'badsite.com'
             WHEN doc_id % 5 = 3 THEN 'example.org'
             ELSE 'site.com' END AS domain,
        (CASE WHEN doc_id % 7 = 0 THEN '/'
              ELSE '/a/' || CAST(doc_id AS VARCHAR) END) ||
        (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&b=2&a=1'
              WHEN doc_id % 4 = 1 THEN '?b=2&a=1'
              WHEN doc_id % 4 = 2 THEN '?utm_campaign=z'
              ELSE '' END) AS target
      FROM documents)
    SELECT doc_id, domain, target,
      CAST(CASE
        WHEN domain = 'example.com' THEN
          CASE WHEN doc_id % 7 = 0 THEN 1
               WHEN substr(CAST(doc_id AS VARCHAR), 1, 1) = '1' THEN 1
               ELSE 0 END
        WHEN domain = 'example.co.uk' THEN
          CASE WHEN doc_id % 7 <> 0 AND (doc_id % 4 IN (0, 1)
                 OR (doc_id % 4 = 3 AND doc_id % 10 = 1))
               THEN 0 ELSE 1 END
        WHEN domain = 'badsite.com' THEN 0
        ELSE 1 END AS BIGINT) AS allowed,
      CASE
        WHEN domain = 'example.com' THEN
          CASE WHEN doc_id % 7 = 0 THEN ''
               WHEN substr(CAST(doc_id AS VARCHAR), 1, 1) = '1' THEN '/a/1'
               ELSE '/a/' END
        WHEN domain = 'example.co.uk' THEN
          CASE WHEN doc_id % 7 <> 0 AND (doc_id % 4 IN (0, 1)
                 OR (doc_id % 4 = 3 AND doc_id % 10 = 1))
               THEN '/a/*1$' ELSE '' END
        WHEN domain = 'badsite.com' THEN '/'
        WHEN domain = 'example.org' THEN
          CASE WHEN doc_id % 7 = 0 THEN '' ELSE '/a/' END
        ELSE '' END AS rule,
      CASE
        WHEN domain = 'example.com' THEN
          CASE WHEN doc_id % 7 = 0 THEN 'none'
               WHEN substr(CAST(doc_id AS VARCHAR), 1, 1) = '1' THEN 'allow'
               ELSE 'disallow' END
        WHEN domain = 'example.co.uk' THEN
          CASE WHEN doc_id % 7 <> 0 AND (doc_id % 4 IN (0, 1)
                 OR (doc_id % 4 = 3 AND doc_id % 10 = 1))
               THEN 'disallow' ELSE 'none' END
        WHEN domain = 'badsite.com' THEN 'disallow'
        WHEN domain = 'example.org' THEN
          CASE WHEN doc_id % 7 = 0 THEN 'none' ELSE 'allow' END
        ELSE 'none' END AS kind
    FROM t ORDER BY doc_id"""

  /** q157: boilerplate blocks — the six planted blocks rebuilt
    * closed-form (texts as literals; the body-prose block from the
    * documents table with q144's ltrim guard for empty docs), anchor
    * char counts as length() arithmetic over the planted anchor texts,
    * the 6-dp density fence, and the rule-order class (density BEFORE
    * word count — the footer link farm has ≥5 words and must still
    * read `bad`). */
  val q157 = """
    WITH b AS (
      SELECT doc_id, CAST(0 AS BIGINT) AS block_idx,
             'Home About us Contact' AS text,
             CAST(length('Home') + length('About us') + length('Contact')
               AS BIGINT) AS anchor_chars
      FROM documents
      UNION ALL
      SELECT doc_id, 1,
             ltrim(trim(coalesce(text, '')) || ' Read the full story today.'),
             0
      FROM documents
      UNION ALL
      SELECT doc_id, 2, 'Short teaser', 0 FROM documents
      UNION ALL
      SELECT doc_id, 3, 'See our promo page for the details of the offer.',
             length('promo page')
      FROM documents
      UNION ALL
      SELECT doc_id, 4, 'Copyright 2024 Example Corp', 0 FROM documents
      UNION ALL
      SELECT doc_id, 5,
             'Terms of service page' || ' ' || 'Privacy policy notice',
             length('Terms of service page') + length('Privacy policy notice')
      FROM documents),
    c AS (SELECT doc_id, block_idx, text, anchor_chars,
             CAST(length(text) AS BIGINT) AS chars,
             CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS words
          FROM b),
    d AS (SELECT *, floor(CAST(anchor_chars AS DOUBLE) / chars * 1e6 + 0.5)
                    / 1e6 AS link_density
          FROM c)
    SELECT doc_id, block_idx, words, chars, anchor_chars, link_density,
           CASE WHEN link_density > 0.33 THEN 'bad'
                WHEN words < 5 THEN 'short'
                ELSE 'good' END AS cls,
           md5(text) AS text_md5
    FROM d ORDER BY doc_id, block_idx"""

  /** q158: MediaWiki dump source — every field rebuilt closed-form from
    * the fixture construction: entity-decoded title (the `&quot;`
    * plant), ns arithmetic, the redirect flag + `&amp;`-decoded target,
    * the text body (escaper round trip + the raw reference tail
    * `A&B <tag> €5`; empty for the self-closing plant), and the
    * missing-title quarantine row (err non-empty, page id still
    * recovered — NOT the planted revision id, which is what a naive
    * "first id anywhere" scan would return for it). */
  val q158 = """
    SELECT doc_id AS page_id,
      CASE WHEN doc_id % 25 = 7 THEN ''
           ELSE 'Doc "' || CAST(doc_id AS VARCHAR) || '"' END AS title,
      CAST(doc_id % 4 AS BIGINT) AS ns,
      CAST(CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS BIGINT) AS redirect,
      CASE WHEN doc_id % 18 = 0 THEN 'Doc "' || CAST(doc_id + 2 AS VARCHAR) || '"'
           WHEN doc_id % 18 = 6 THEN 'Doc "' || CAST(doc_id - 6 AS VARCHAR) || '"'
           WHEN doc_id % 6 = 0 THEN 'R & D ' || CAST(doc_id AS VARCHAR)
           ELSE '' END AS redirect_title,
      md5(CASE WHEN doc_id % 9 = 0 THEN ''
            ELSE coalesce(text, '') || ' A&B <tag> ' || chr(8364) || '5'
          END) AS text_md5,
      CASE WHEN doc_id % 25 = 7 THEN 'missing id or title'
           ELSE '' END AS err
    FROM documents ORDER BY page_id"""

  /** q159: lexicon scan — INDEPENDENT machinery (list lambdas over the
    * token array, bigrams as position filters counting overlaps), the
    * weighted score under the 6-dp fence, and the (count desc, name
    * asc) top-pattern election via a struct sort on (-count, name). */
  val q159 = """
    WITH t AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(coalesce(text, '')),
          '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
    c AS (SELECT doc_id,
        len(list_filter(toks, x -> x = 'spark')) AS c_spark,
        len(list_filter(toks, x -> x = 'slow')) AS c_slow,
        len(list_filter(toks, x -> x = 'dup')) AS c_dup,
        len(list_filter(toks, x -> x = 'batch')) AS c_batch,
        len(list_filter(range(1, len(toks)),
          i -> toks[i] = 'batch' AND toks[i+1] = 'batch')) AS c_bb,
        len(list_filter(range(1, len(toks)),
          i -> toks[i] = 'table' AND toks[i+1] = 'scan')) AS c_ts
      FROM t),
    s AS (SELECT doc_id,
        CAST(c_spark + c_slow + c_dup + c_batch + c_bb + c_ts AS BIGINT)
          AS n_hits,
        CAST((CASE WHEN c_spark > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN c_slow > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN c_dup > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN c_batch > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN c_bb > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN c_ts > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_patterns,
        floor((1.0*c_spark + 2.0*c_slow + 5.0*c_dup + 1.0*c_batch +
               3.0*c_bb + 4.0*c_ts) * 1e6 + 0.5) / 1e6 AS score,
        (list_sort([
           {'k': -c_spark, 'n': 'spark'},
           {'k': -c_slow, 'n': 'slow'},
           {'k': -c_dup, 'n': 'dup'},
           {'k': -c_batch, 'n': 'batch'},
           {'k': -c_bb, 'n': 'batch batch'},
           {'k': -c_ts, 'n': 'table scan'}]))[1] AS top
      FROM c)
    SELECT doc_id, n_hits, n_patterns, score,
      CASE WHEN top.k = 0 THEN '' ELSE top.n END AS top_pattern
    FROM s ORDER BY doc_id"""

  /** q160: crawl pipeline v2 — q146's closed-form replay with two more
    * stages folded in: the robots admission predicate (q156's
    * residue-class verdicts inlined as one boolean CASE) composed with
    * the blocklist, and the boilerplate stage's outcome (on the q144
    * page only the content block survives — the anchor div is density
    * 1.0, the list items are 2-word stubs — so the cleaned doc is ONE
    * line and n_lines/n_kept pin to 1, vs q146's 4/1 via the line
    * rule). Keeper election runs over the SMALLER robots-surviving
    * corpus, so keeper ids differ from q146 wherever a duplicate's
    * min-id doc was robots-disallowed. */
  val q160 = """
    WITH a AS (SELECT doc_id,
        CASE WHEN doc_id % 5 = 0 THEN
               CASE WHEN doc_id % 7 = 0 THEN 1
                    WHEN substr(CAST(doc_id AS VARCHAR), 1, 1) = '1' THEN 1
                    ELSE 0 END
             WHEN doc_id % 5 = 1 THEN
               CASE WHEN doc_id % 7 <> 0 AND (doc_id % 4 IN (0, 1)
                      OR (doc_id % 4 = 3 AND doc_id % 10 = 1))
                    THEN 0 ELSE 1 END
             WHEN doc_id % 5 = 2 THEN 0
             ELSE 1 END AS allowed
      FROM documents),
    base AS (SELECT d.doc_id,
        ltrim(trim(coalesce(d.text, '')) || ' Fish & Chips <deal> ' ||
          chr(8364) || '5 ' || chr(160) || 'now.') AS pline
      FROM documents d JOIN a USING (doc_id)
      WHERE a.allowed = 1 AND d.doc_id % 5 <> 2),
    k AS (SELECT pline, min(doc_id) AS keeper_id FROM base GROUP BY pline)
    SELECT b.doc_id, CAST(1 AS BIGINT) AS n_lines, CAST(1 AS BIGINT) AS n_kept,
           md5(b.pline) AS clean_md5, CAST(k.keeper_id AS BIGINT) AS keeper_id,
           CAST(CASE WHEN b.doc_id = k.keeper_id THEN 1 ELSE 0 END AS BIGINT)
             AS is_keeper
    FROM base b JOIN k USING (pline)
    ORDER BY b.doc_id"""

  /** q161: wikitext cleanup — cleaned text rebuilt line-for-line
    * (heading fences stripped, quote runs gone, link labels in place,
    * template/file lines vanished with their line breaks, the q144-style
    * ltrim guard for empty docs) and the removal counters from the
    * plant arithmetic (nested template = ONE outer drop). */
  val q161 = """
    SELECT doc_id,
      CAST(2 AS BIGINT) AS n_links,
      CAST(1 AS BIGINT) AS n_ext,
      CAST(CASE WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END AS BIGINT) AS n_tmpl,
      CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_files,
      CAST(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS BIGINT) AS n_refs,
      md5('Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
          'Lead for doc ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) ||
          'first item' || chr(10) ||
          ltrim(trim(coalesce(text, '')) || ' See pipeline and ext link.') ||
          chr(10) || 'See also') AS clean_md5
    FROM documents ORDER BY doc_id"""

  /** q162: wiki dump→corpus — page selection from the q158 plant
    * arithmetic (clean parse, ns = 0, non-redirect, non-empty text),
    * the cleaned line (the `<tag>` plant strips and its double space
    * collapses; `&` and `€` are plain text to wikitext), and the
    * min-id keeper election. */
  val q162 = """
    WITH base AS (SELECT doc_id,
        ltrim(trim(coalesce(text, '')) || ' A&B ' || chr(8364) || '5') AS cl
      FROM documents
      WHERE doc_id % 25 <> 7 AND doc_id % 4 = 0 AND doc_id % 6 <> 0
        AND doc_id % 9 <> 0),
    k AS (SELECT cl, min(doc_id) AS keeper_id FROM base GROUP BY cl)
    SELECT b.doc_id, md5(b.cl) AS clean_md5,
           CAST(k.keeper_id AS BIGINT) AS keeper_id,
           CAST(CASE WHEN b.doc_id = k.keeper_id THEN 1 ELSE 0 END AS BIGINT)
             AS is_keeper
    FROM base b JOIN k USING (cl) ORDER BY b.doc_id"""

  /** q163: redirect resolution — the chain grid is closed-form: last
    * digit 1 resolves 3 hops to id+7, 3 resolves 2 hops to id+5, 7
    * resolves 1 hop to id+1; the % 100 ∈ {41, 43} override is a 2-cycle
    * (41→43, 43→41 — note 41's edge is its NATURAL +2 edge) whose rows
    * mask to (-1, -1, 0). */
  val q163 = """
    SELECT doc_id AS src,
      CAST(CASE WHEN doc_id % 100 IN (41, 43) THEN -1
                WHEN doc_id % 10 = 1 THEN doc_id + 7
                WHEN doc_id % 10 = 3 THEN doc_id + 5
                ELSE doc_id + 1 END AS BIGINT) AS final_dst,
      CAST(CASE WHEN doc_id % 100 IN (41, 43) THEN -1
                WHEN doc_id % 10 = 1 THEN 3
                WHEN doc_id % 10 = 3 THEN 2
                ELSE 1 END AS BIGINT) AS depth,
      CAST(CASE WHEN doc_id % 100 IN (41, 43) THEN 0 ELSE 1 END AS BIGINT)
        AS terminated
    FROM documents
    WHERE doc_id % 10 IN (1, 3, 7)
    ORDER BY src"""

  /** q164: link-graph edges — every planted href class rebuilt
    * closed-form: absolute pass-through, protocol-relative scheme
    * inheritance, rooted path, child-relative and `../` RFC 3986
    * merges against the `/a/b/` base dir, colon-bearing relative ref
    * (`watch?t=1:30` resolves against the base dir — not a scheme),
    * fragment-only self link; mailto and href-less anchors (incl. the
    * `href=` decoy inside the title value) emit nothing, so link_idx is
    * dense 0-6; registered domains via the PSL default rule. */
  val q164 = """
    WITH b AS (SELECT doc_id,
        'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS root,
        'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS dom
      FROM documents)
    SELECT doc_id, CAST(0 AS BIGINT) AS link_idx,
           'https://ext.example/page?z=1' AS href,
           'https://ext.example/page?z=1' AS resolved,
           'Abs & Link' AS anchor, 'ext.example' AS domain FROM b
    UNION ALL SELECT doc_id, 1, '//cdn.example/lib',
           'https://cdn.example/lib', 'Proto Rel', 'cdn.example' FROM b
    UNION ALL SELECT doc_id, 2, '/rooted/page',
           root || '/rooted/page', 'Rooted', dom FROM b
    UNION ALL SELECT doc_id, 3, 'sub/page.html',
           root || '/a/b/sub/page.html', 'Child', dom FROM b
    UNION ALL SELECT doc_id, 4, '../up/page.html',
           root || '/a/up/page.html', 'Up', dom FROM b
    UNION ALL SELECT doc_id, 5, 'watch?t=1:30',
           root || '/a/b/watch?t=1:30', 'Colon Rel', dom FROM b
    UNION ALL SELECT doc_id, 6, '#top',
           root || '/a/b/doc' || CAST(doc_id AS VARCHAR) || '.html',
           'Self ' || CAST(doc_id AS VARCHAR), dom FROM b
    ORDER BY doc_id, link_idx"""

  /** q165: crawl→graph→centrality — the whole chain replayed
    * closed-form: each page of class k = doc_id%5 emits one hub edge
    * whose CANONICAL domain follows m = doc_id%4 (0/1 → news.example —
    * the 1- and 2-hop chains; 2 → redir.example — the self-cycle keeps
    * its crawl URL; 3 → shop.example) plus one static news edge; the
    * /local/nav self-domain edge dies on the intra-domain cut. Domain
    * edges aggregate as counts, then all 5 PageRank iterations unroll
    * with the q123 arithmetic PLUS the live dangling term (news/shop/
    * redir have no out-edges): the dangling scalar is 9-dp fenced on
    * both engines (the q147 dg convention), redistributed uniformly
    * (dm / n), and every rank re-fences per iteration. */
  /** The q165 CTE list WITHOUT the WITH keyword (b … r5, final ranks in
    * `r5`) — shared by [[q165]] (and q177, whose oracle IS q165's
    * replay) and embedded into composite oracles that join a PageRank
    * prior onto another replay (q184). */
  private val q165RankCtes: String = {
    val head = """
    b AS (SELECT doc_id % 5 AS k, doc_id % 4 AS m FROM documents),
    de AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS src,
             CASE WHEN m IN (0, 1) THEN 'news.example'
                  WHEN m = 2 THEN 'redir.example'
                  ELSE 'shop.example' END AS dst
      FROM b
      UNION ALL
      SELECT 'site' || CAST(k AS VARCHAR) || '.example', 'news.example'
      FROM b),
    edges AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
              FROM de GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT node FROM (
      SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    r0 AS (SELECT node, floor(1.0 / nn.n * 1e9 + 0.5) / 1e9 AS rnk
           FROM nodes, nn)"""
    val its = (1 to 5).map { i =>
      s"""
    c$i AS (SELECT e.dst AS node, sum(r.rnk * e.w / o.ow) AS inw
            FROM edges e JOIN outw o ON e.src = o.src
            JOIN r${i - 1} r ON r.node = e.src
            GROUP BY e.dst),
    dg$i AS (SELECT floor(coalesce(sum(r.rnk), 0.0) * 1e9 + 0.5) / 1e9 AS dm
             FROM r${i - 1} r LEFT JOIN outw o ON o.src = r.node
             WHERE o.src IS NULL),
    r$i AS (SELECT n.node,
              floor(((1.0 - 0.85) / nn.n
                     + 0.85 * (coalesce(c.inw, 0.0) + dg$i.dm / nn.n))
                    * 1e9 + 0.5) / 1e9 AS rnk
            FROM nodes n CROSS JOIN nn CROSS JOIN dg$i
            LEFT JOIN c$i c ON c.node = n.node)"""
    }.mkString(",")
    head + "," + its
  }

  val q165: String = "WITH " + q165RankCtes + """
    SELECT node, rnk AS "rank" FROM r5 ORDER BY node"""

  /** q169: domain TrustRank — the q147 personalized-PageRank replay
    * (rst seed mass, per-iteration 9-dp-fenced dangling scalar
    * redistributed THROUGH rst, the (1-d)*rst + d*(in + dm*rst)
    * association) over the q165 crawl-derived domain edge CTEs with a
    * two-host literal seed set. Unreachable unseeded hosts must fence
    * to exactly 0.0. */
  /** Shared CTE prefix for q169/q182: the q165 crawl-derived domain
    * edges + the full 5-iteration personalized-PageRank unroll (final
    * ranks land in `r5`; `b` holds the per-doc residue classes for
    * downstream count rebuilds). */
  private def q169TrustCtes: String = {
    val head = """
    WITH b AS (SELECT doc_id % 5 AS k, doc_id % 4 AS m FROM documents),
    de AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS src,
             CASE WHEN m IN (0, 1) THEN 'news.example'
                  WHEN m = 2 THEN 'redir.example'
                  ELSE 'shop.example' END AS dst
      FROM b
      UNION ALL
      SELECT 'site' || CAST(k AS VARCHAR) || '.example', 'news.example'
      FROM b),
    edges AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
              FROM de GROUP BY 1, 2),
    srcs AS (SELECT 'site0.example' AS node
             UNION ALL SELECT 'site1.example'),
    gnodes AS (SELECT DISTINCT node FROM (
      SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    nodes AS (SELECT node FROM gnodes UNION SELECT node FROM srcs),
    ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM srcs),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    nr AS (SELECT nodes.node,
             CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS rst
           FROM nodes CROSS JOIN ns LEFT JOIN srcs s ON s.node = nodes.node),
    r0 AS (SELECT node, rst, floor(rst * 1e9 + 0.5) / 1e9 AS rnk FROM nr)"""
    val its = (1 to 5).map { i =>
      s"""
    c$i AS (SELECT e.dst AS node, sum(r.rnk * e.w / o.ow) AS inw
            FROM edges e JOIN outw o ON e.src = o.src
            JOIN r${i - 1} r ON r.node = e.src
            GROUP BY e.dst),
    dg$i AS (SELECT floor(coalesce(sum(r.rnk), 0.0) * 1e9 + 0.5) / 1e9 AS dm
             FROM r${i - 1} r LEFT JOIN outw o ON o.src = r.node
             WHERE o.src IS NULL),
    r$i AS (SELECT n.node, n.rst,
              floor(((1.0 - 0.85) * n.rst
                     + 0.85 * (coalesce(c.inw, 0.0) + dg$i.dm * n.rst))
                    * 1e9 + 0.5) / 1e9 AS rnk
            FROM nr n CROSS JOIN dg$i LEFT JOIN c$i c ON c.node = n.node)"""
    }.mkString(",")
    head + "," + its
  }

  val q169: String = q169TrustCtes + """
    SELECT node, rnk AS "rank" FROM r5 ORDER BY node"""

  /** q182: trust-prioritized recrawl frontier — the q169 PPR unroll,
    * then per-target endorsement rebuilt from the residue classes (each
    * doc endorses its redirect-canonicalized hub class + the static
    * news URL; nav is intra-domain and dies on the edge cut), the 9-dp
    * endorsement fence, the per-domain (endorsement desc, url) slot
    * window, and the delay decision table: news declares 5 for
    * GraftBot; shop's GraftBot group exists but declares nothing (empty
    * Disallow) so the `*` group's 99 must NOT bind → default 1; redir
    * has no robots row → default 1. */
  val q182: String = q169TrustCtes + """,
    pc AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS sd,
             CASE WHEN m IN (0, 1) THEN 'https://news.example/final0'
                  WHEN m = 2 THEN 'https://redir.example/r2'
                  ELSE 'https://shop.example/final3' END AS tgt
      FROM b
      UNION ALL
      SELECT 'site' || CAST(k AS VARCHAR) || '.example',
             'https://news.example/static'
      FROM b),
    pcc AS (SELECT sd, tgt, CAST(count(*) AS DOUBLE) AS c
            FROM pc GROUP BY 1, 2),
    en AS (SELECT p.tgt AS url,
             floor(sum(r.rnk * p.c) * 1e9 + 0.5) / 1e9 AS endorsement
           FROM pcc p JOIN r5 r ON r.node = p.sd GROUP BY p.tgt),
    wv AS (SELECT url, endorsement,
             CASE WHEN url LIKE 'https://news.example/%' THEN 'news.example'
                  WHEN url LIKE 'https://redir.example/%'
                    THEN 'redir.example'
                  ELSE 'shop.example' END AS domain
           FROM en),
    sl AS (SELECT url, domain, endorsement,
             row_number() OVER (PARTITION BY domain
                                ORDER BY endorsement DESC, url) - 1 AS slot
           FROM wv)
    SELECT url, domain, endorsement, CAST(slot AS BIGINT) AS slot,
           CASE WHEN domain = 'news.example' THEN 5.0 ELSE 1.0 END AS delay,
           slot * (CASE WHEN domain = 'news.example' THEN 5.0 ELSE 1.0 END)
             AS fetch_at
    FROM sl ORDER BY url"""

  /** q183: HITS over the q165 domain edges — both half-steps of all 5
    * iterations unrolled: per round the weighted in-mass aggregate, the
    * 9-dp-fenced L1 total, the fenced normalize (auth then hub), from a
    * uniform 1/n hub init. Sinks (news/redir/shop) fence to hub 0.0,
    * sources (the site hosts) to auth 0.0. The iteration CTEs are
    * MATERIALIZED (the q108 convention): each ar/hr is referenced twice
    * (L1 total + normalize), so inlining doubles the expression tree
    * per half-step — 2^10 rebuilds of the documents scan by r5,
    * observed as DuckDB fd exhaustion. */
  val q183: String = {
    val head = """
    WITH b AS (SELECT doc_id % 5 AS k, doc_id % 4 AS m FROM documents),
    de AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS src,
             CASE WHEN m IN (0, 1) THEN 'news.example'
                  WHEN m = 2 THEN 'redir.example'
                  ELSE 'shop.example' END AS dst
      FROM b
      UNION ALL
      SELECT 'site' || CAST(k AS VARCHAR) || '.example', 'news.example'
      FROM b),
    edges AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
              FROM de GROUP BY 1, 2),
    nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
      SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    h0 AS (SELECT node, floor(1.0 / nn.n * 1e9 + 0.5) / 1e9 AS hub
           FROM nodes, nn)"""
    val its = (1 to 5).map { i =>
      s"""
    ar$i AS MATERIALIZED (SELECT e.dst AS node, sum(h.hub * e.w) AS raw
             FROM edges e JOIN h${i - 1} h ON h.node = e.src
             GROUP BY e.dst),
    at$i AS (SELECT floor(coalesce(sum(raw), 0.0) * 1e9 + 0.5) / 1e9 AS t
             FROM ar$i),
    a$i AS MATERIALIZED (SELECT n.node,
              floor(coalesce(ar.raw, 0.0) / at$i.t * 1e9 + 0.5) / 1e9
                AS auth
            FROM nodes n CROSS JOIN at$i
            LEFT JOIN ar$i ar ON ar.node = n.node),
    hr$i AS MATERIALIZED (SELECT e.src AS node, sum(a.auth * e.w) AS raw
             FROM edges e JOIN a$i a ON a.node = e.dst
             GROUP BY e.src),
    ht$i AS (SELECT floor(coalesce(sum(raw), 0.0) * 1e9 + 0.5) / 1e9 AS t
             FROM hr$i),
    h$i AS MATERIALIZED (SELECT n.node,
              floor(coalesce(hr.raw, 0.0) / ht$i.t * 1e9 + 0.5) / 1e9
                AS hub
            FROM nodes n CROSS JOIN ht$i
            LEFT JOIN hr$i hr ON hr.node = n.node)"""
    }.mkString(",")
    head + "," + its + """
    SELECT h5.node, h5.hub, a5.auth
    FROM h5 JOIN a5 ON a5.node = h5.node ORDER BY h5.node"""
  }

  /** q185: warm-start incremental re-rank — BOTH eras unrolled
    * closed-form with a prefix-parametrized copy of the q165 rank
    * arithmetic: era `y` (yesterday) is the 5-iteration cold unroll
    * over the batch-0 site0/site1 slice of the crawl plant; era `t`
    * (today) is 2 iterations over the FULL graph whose r0 is
    * coalesce(yr5.rnk, fenced 1/n) — the warm seam, with the three
    * hosts absent from yesterday's vector taking the uniform default.
    * Same fences, same dangling scalar, same left-assoc contribution
    * as q165's replay. */
  val q185: String = {
    def unroll(p: String, where: String, iters: Int, r0: String): String = {
      val head = s"""
    ${p}b AS (SELECT doc_id % 5 AS k, doc_id % 4 AS m FROM documents$where),
    ${p}de AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS src,
             CASE WHEN m IN (0, 1) THEN 'news.example'
                  WHEN m = 2 THEN 'redir.example'
                  ELSE 'shop.example' END AS dst
      FROM ${p}b
      UNION ALL
      SELECT 'site' || CAST(k AS VARCHAR) || '.example', 'news.example'
      FROM ${p}b),
    ${p}edges AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
              FROM ${p}de GROUP BY 1, 2),
    ${p}nodes AS (SELECT DISTINCT node FROM (
      SELECT src AS node FROM ${p}edges
      UNION ALL SELECT dst FROM ${p}edges)),
    ${p}nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ${p}nodes),
    ${p}outw AS (SELECT src, sum(w) AS ow FROM ${p}edges GROUP BY src),
    $r0"""
      val its = (1 to iters).map { i =>
        s"""
    ${p}c$i AS (SELECT e.dst AS node, sum(r.rnk * e.w / o.ow) AS inw
            FROM ${p}edges e JOIN ${p}outw o ON e.src = o.src
            JOIN ${p}r${i - 1} r ON r.node = e.src
            GROUP BY e.dst),
    ${p}dg$i AS (SELECT floor(coalesce(sum(r.rnk), 0.0) * 1e9 + 0.5) / 1e9
               AS dm
             FROM ${p}r${i - 1} r LEFT JOIN ${p}outw o ON o.src = r.node
             WHERE o.src IS NULL),
    ${p}r$i AS (SELECT n.node,
              floor(((1.0 - 0.85) / nn.n
                     + 0.85 * (coalesce(c.inw, 0.0) + dg.dm / nn.n))
                    * 1e9 + 0.5) / 1e9 AS rnk
            FROM ${p}nodes n CROSS JOIN ${p}nn nn CROSS JOIN ${p}dg$i dg
            LEFT JOIN ${p}c$i c ON c.node = n.node)"""
      }.mkString(",")
      head + "," + its
    }
    "WITH " +
      unroll("y", " WHERE doc_id % 3 = 0 AND doc_id % 5 < 2", 5,
        """yr0 AS (SELECT node, floor(1.0 / nn.n * 1e9 + 0.5) / 1e9 AS rnk
           FROM ynodes, ynn nn)""") +
      "," +
      unroll("t", "", 2,
        """tr0 AS (SELECT n.node,
             coalesce(y.rnk, floor(1.0 / nn.n * 1e9 + 0.5) / 1e9) AS rnk
           FROM tnodes n CROSS JOIN tnn nn
           LEFT JOIN yr5 y ON y.node = n.node)""") + """
    SELECT node, rnk AS "rank" FROM tr2 ORDER BY node"""
  }

  /** q166: anchor-text corpus — counts per (class target, anchor)
    * replayed by GROUP BY over the residue plant, the top-3 election as
    * an explicit (count desc, anchor asc) window; the near-equal class
    * counts make the tie-break genuinely load-bearing. */
  val q166 = """
    WITH b AS (SELECT doc_id % 3 AS c, doc_id % 4 AS a FROM documents),
    an AS (
      SELECT 'https://t' || CAST(c AS VARCHAR) || '.example/page' AS target,
             'A' || CAST(a AS VARCHAR) AS anchor FROM b
      UNION ALL
      SELECT 'https://t' || CAST(c AS VARCHAR) || '.example/page', 'Common'
      FROM b),
    cnt AS (SELECT target, anchor, count(*) AS cnt FROM an GROUP BY 1, 2),
    rk AS (SELECT target, anchor, cnt,
             row_number() OVER (PARTITION BY target
                                ORDER BY cnt DESC, anchor ASC) AS rnk
           FROM cnt)
    SELECT target, CAST(rnk AS BIGINT) AS "rank", anchor,
           CAST(cnt AS BIGINT) AS cnt
    FROM rk WHERE rnk <= 3 ORDER BY target, "rank""""

  /** q167: wiki redirect alias map — the resolution grid replayed with
    * SQL joins over the rebuilt page/redirect tables: the title
    * dictionary (quarantined %25=7 pages absent), the target join
    * (`R & D` targets miss → broken aliases), the ≤2-hop chain as one
    * explicit left-join step, termination = final dst is not an edge
    * source, and the -1/''/0 masks for unresolved rows. */
  val q167 = """
    WITH p AS (SELECT doc_id AS id,
                 'Doc "' || CAST(doc_id AS VARCHAR) || '"' AS title
               FROM documents WHERE doc_id % 25 <> 7),
    r AS (SELECT id, title,
            CASE WHEN id % 18 = 0
                   THEN 'Doc "' || CAST(id + 2 AS VARCHAR) || '"'
                 WHEN id % 18 = 6
                   THEN 'Doc "' || CAST(id - 6 AS VARCHAR) || '"'
                 ELSE 'R & D ' || CAST(id AS VARCHAR) END AS rt
          FROM p WHERE id % 6 = 0),
    e AS (SELECT r.id AS src, t.id AS dst FROM r JOIN p t ON t.title = r.rt),
    s2 AS (SELECT e.src, coalesce(e2.dst, e.dst) AS dst,
                  1 + CASE WHEN e2.dst IS NULL THEN 0 ELSE 1 END AS depth
           FROM e LEFT JOIN e e2 ON e2.src = e.dst),
    fin AS (SELECT s2.src, s2.dst, s2.depth,
                   CASE WHEN x.src IS NULL THEN 1 ELSE 0 END AS term
            FROM s2 LEFT JOIN (SELECT DISTINCT src FROM e) x
              ON x.src = s2.dst)
    SELECT r.id AS page_id, r.title, r.rt AS redirect_title,
           CAST(coalesce(CASE WHEN fin.term = 1 THEN fin.dst END, -1)
                AS BIGINT) AS final_page_id,
           coalesce(CASE WHEN fin.term = 1
                      THEN 'Doc "' || CAST(fin.dst AS VARCHAR) || '"' END,
                    '') AS final_title,
           CAST(coalesce(CASE WHEN fin.term = 1 THEN fin.depth END, 0)
                AS BIGINT) AS depth,
           CAST(coalesce(fin.term, 0) AS BIGINT) AS resolved
    FROM r LEFT JOIN fin ON fin.src = r.id
    ORDER BY page_id"""

  /** q168: JPEG/EXIF triage — every field is pure residue arithmetic:
    * dims mirror the encode inputs, the quarantine classes mask to
    * -1/0 with their error strings, orientation follows the id%8 plant
    * except the no-EXIF class, and n_segments counts exactly the
    * segments the walk passes per class (bad magic 0; truncated 2 —
    * COM + SOF, the cut lands mid-SOS and the truncated class id%25=18
    * implies id%5=3 so no APP1; clean 3 without EXIF, 4 with). */
  val q168 = """
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 25 IN (9, 18) THEN -1
                ELSE 16 + doc_id % 64 END AS BIGINT) AS width,
      CAST(CASE WHEN doc_id % 25 IN (9, 18) THEN -1
                ELSE 16 + (doc_id * 7) % 64 END AS BIGINT) AS height,
      CAST(CASE WHEN doc_id % 25 IN (9, 18) THEN 0
                WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS BIGINT)
        AS progressive,
      CAST(CASE WHEN doc_id % 25 IN (9, 18) OR doc_id % 5 = 3 THEN 0
                ELSE 1 + doc_id % 8 END AS BIGINT) AS orientation,
      CAST(CASE WHEN doc_id % 25 IN (9, 18) OR doc_id % 5 = 3 THEN 0
                ELSE 1 END AS BIGINT) AS has_exif,
      CAST(CASE WHEN doc_id % 25 = 9 THEN 0
                WHEN doc_id % 25 = 18 THEN 2
                WHEN doc_id % 5 = 3 THEN 3 ELSE 4 END AS BIGINT)
        AS n_segments,
      CASE WHEN doc_id % 25 = 9 THEN 'bad magic'
           WHEN doc_id % 25 = 18 THEN 'truncated'
           ELSE '' END AS err
    FROM documents ORDER BY doc_id"""

  /** q170: sitemap seed list — every entry AND every robots verdict
    * rebuilt closed-form: the urlset rows (full entry with the planted
    * lastmod/changefreq/priority arithmetic; the minimal entry with the
    * decoded `&` and the spec's 0.5 default; the missing-loc quarantine
    * keeping its lastmod), the sitemapindex rows on the %11=5 class,
    * and the q156 decision table applied to each loc (badsite blanket
    * disallow, co.uk's `/a/` + `*1$` catching last-digit-1 ids on entry 0,
    * example.com's allow-wins `/a/1` tie admitting every entry 0). */
  val q170 = """
    WITH t AS (SELECT doc_id,
        doc_id % 4 AS d4, doc_id % 7 AS d7, doc_id % 9 AS d9,
        doc_id % 3 AS d3, doc_id % 10 AS d10, doc_id % 11 AS d11,
        CASE WHEN doc_id % 5 = 0 THEN 'example.com'
             WHEN doc_id % 5 = 1 THEN 'example.co.uk'
             WHEN doc_id % 5 = 2 THEN 'badsite.com'
             WHEN doc_id % 5 = 3 THEN 'example.org'
             ELSE 'site.com' END AS dom
      FROM documents),
    rows_ AS (
      SELECT doc_id, 0 AS entry_idx, 'url' AS kind,
             'https://' || dom || '/a/1?p=' || CAST(doc_id AS VARCHAR)
               AS loc,
             '2024-0' || CAST(d9 + 1 AS VARCHAR) || '-1' ||
               CAST(d3 AS VARCHAR) AS lastmod,
             CASE WHEN d4 = 0 THEN 'daily' WHEN d4 = 1 THEN 'weekly'
                  WHEN d4 = 2 THEN 'monthly' ELSE 'never' END
               AS changefreq,
             CAST('0.' || CAST(d10 AS VARCHAR) AS DOUBLE) AS priority,
             CASE WHEN dom = 'badsite.com' THEN 0
                  WHEN dom = 'example.co.uk' AND d10 = 1 THEN 0
                  ELSE 1 END AS allowed,
             '' AS err
      FROM t WHERE d11 <> 5
      UNION ALL
      SELECT doc_id, 1, 'url',
             'https://' || dom || '/b/' || CAST(doc_id AS VARCHAR) ||
               '?x=1&y=2',
             '', '', CAST(0.5 AS DOUBLE),
             CASE WHEN dom = 'badsite.com' THEN 0 ELSE 1 END, ''
      FROM t WHERE d11 <> 5
      UNION ALL
      SELECT doc_id, 2, 'error', '', '2024-01-01', '',
             CAST(0.0 AS DOUBLE), 0, 'missing loc'
      FROM t WHERE d11 <> 5 AND d7 = 0
      UNION ALL
      SELECT doc_id, 0, 'sitemap', 'https://' || dom || '/maps/m1.xml',
             '2024-02-02', '', CAST(0.0 AS DOUBLE),
             CASE WHEN dom = 'badsite.com' THEN 0 ELSE 1 END, ''
      FROM t WHERE d11 = 5
      UNION ALL
      SELECT doc_id, 1, 'sitemap', 'https://' || dom || '/maps/m2.xml',
             '', '', CAST(0.0 AS DOUBLE),
             CASE WHEN dom = 'badsite.com' THEN 0 ELSE 1 END, ''
      FROM t WHERE d11 = 5)
    SELECT doc_id, CAST(entry_idx AS BIGINT) AS entry_idx, kind, loc,
           lastmod, changefreq, priority, CAST(allowed AS BIGINT)
             AS allowed, err
    FROM rows_ ORDER BY doc_id, entry_idx"""

  /** q171: canonical dedup — every elected canonical rebuilt
    * closed-form (the %8=4 rooted form normalizes to the page's own
    * lowercased host, the shared absolute form keys the %4∈{0,2} pair,
    * og drops the tracking param, mailto falls through to the
    * normalized self URL), then the min-id keeper election replayed by
    * GROUP BY — no id-density assumption. */
  val q171 = """
    WITH c AS (SELECT doc_id,
      CASE WHEN doc_id % 4 IN (0, 2) THEN 'canonical'
           WHEN doc_id % 4 = 1 THEN 'og:url'
           ELSE 'self' END AS canon_src,
      CASE WHEN doc_id % 8 = 4
             THEN 'http://site' || CAST(doc_id % 5 AS VARCHAR) ||
                  '.example/c/' || CAST(doc_id AS VARCHAR)
           WHEN doc_id % 4 IN (0, 2)
             THEN 'https://canon.example/c/' ||
                  CAST(doc_id - doc_id % 4 AS VARCHAR)
           WHEN doc_id % 4 = 1
             THEN 'https://canon.example/og/' ||
                  CAST(doc_id AS VARCHAR) || '?z=1'
           ELSE 'http://site' || CAST(doc_id % 5 AS VARCHAR) ||
                '.example/p/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
           END AS canonical
      FROM documents),
    k AS (SELECT canonical, min(doc_id) AS keeper_id FROM c GROUP BY 1)
    SELECT c.doc_id, c.canon_src, c.canonical,
           CAST(k.keeper_id AS BIGINT) AS keeper_id,
           CAST(CASE WHEN c.doc_id = k.keeper_id THEN 0 ELSE 1 END
                AS BIGINT) AS is_dup
    FROM c JOIN k USING (canonical) ORDER BY c.doc_id"""

  /** q172: crawl pipeline v3 — q160's replay with the two composed
    * round-12 stages rebuilt closed-form: the advertised flag is an
    * EXISTS over normalized-URL equality against the id%3=0 seed set
    * (URL form, not id — the m7=0 path-less classes collide after
    * normalization); the canonical election per residue (shared
    * absolute canonical on %4∈{0,2}, og:url sans tracking on %4=1,
    * normalized self on %4=3) groups the robots+blocklist SURVIVORS
    * with min-id keeper + n_variants; boilerplate/C4 pin to the q160
    * one-line outcome; content keeper election runs over canonical
    * keepers only. */
  val q172 = """
    WITH nu AS (SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) || '://' ||
        (CASE WHEN doc_id % 5 = 0 THEN 'news.example.com'
              WHEN doc_id % 5 = 1 THEN 'blog.example.co.uk'
              WHEN doc_id % 5 = 2 THEN 'spam.badsite.com'
              WHEN doc_id % 5 = 3 THEN 'example.org'
              ELSE 'cdn.site.com' END) ||
        (CASE WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) ||
        (CASE WHEN doc_id % 7 = 0 THEN '/'
              ELSE '/a/' || CAST(doc_id AS VARCHAR) END) ||
        (CASE WHEN doc_id % 4 IN (0, 1) THEN '?a=1&b=2' ELSE '' END)
          AS norm
      FROM documents),
    af AS (SELECT n.doc_id,
        CASE WHEN n.norm IN (SELECT norm FROM nu WHERE doc_id % 3 = 0)
             THEN 1 ELSE 0 END AS advertised
      FROM nu n),
    a AS (SELECT doc_id,
        CASE WHEN doc_id % 5 = 0 THEN
               CASE WHEN doc_id % 7 = 0 THEN 1
                    WHEN substr(CAST(doc_id AS VARCHAR), 1, 1) = '1' THEN 1
                    ELSE 0 END
             WHEN doc_id % 5 = 1 THEN
               CASE WHEN doc_id % 7 <> 0 AND (doc_id % 4 IN (0, 1)
                      OR (doc_id % 4 = 3 AND doc_id % 10 = 1))
                    THEN 0 ELSE 1 END
             WHEN doc_id % 5 = 2 THEN 0
             ELSE 1 END AS allowed
      FROM documents),
    surv AS (SELECT doc_id FROM a
      WHERE allowed = 1 AND doc_id % 5 <> 2),
    canon AS (SELECT s.doc_id,
        CASE WHEN s.doc_id % 4 IN (0, 2) THEN 'canonical'
             WHEN s.doc_id % 4 = 1 THEN 'og:url' ELSE 'self' END
          AS canon_src,
        CASE WHEN s.doc_id % 4 IN (0, 2)
               THEN 'https://dup.example/c/' ||
                    CAST(s.doc_id - s.doc_id % 4 AS VARCHAR)
             WHEN s.doc_id % 4 = 1
               THEN 'https://og.example/p/' || CAST(s.doc_id AS VARCHAR)
             ELSE n.norm END AS canonical
      FROM surv s JOIN nu n USING (doc_id)),
    ck AS (SELECT canonical, min(doc_id) AS ckeeper,
             count(*) AS n_variants
           FROM canon GROUP BY 1),
    base AS (SELECT c.doc_id, c.canon_src, c.canonical, k.n_variants,
        ltrim(trim(coalesce(d.text, '')) || ' Fish & Chips <deal> ' ||
          chr(8364) || '5 ' || chr(160) || 'now.') AS pline
      FROM canon c JOIN ck k USING (canonical)
      JOIN documents d ON d.doc_id = c.doc_id
      WHERE c.doc_id = k.ckeeper),
    tk AS (SELECT pline, min(doc_id) AS keeper_id FROM base GROUP BY 1)
    SELECT b.doc_id, CAST(af.advertised AS BIGINT) AS advertised,
           b.canon_src, b.canonical,
           CAST(b.n_variants AS BIGINT) AS n_variants,
           CAST(1 AS BIGINT) AS n_lines, CAST(1 AS BIGINT) AS n_kept,
           md5(b.pline) AS clean_md5,
           CAST(tk.keeper_id AS BIGINT) AS keeper_id,
           CAST(CASE WHEN b.doc_id = tk.keeper_id THEN 1 ELSE 0 END
                AS BIGINT) AS is_keeper
    FROM base b JOIN tk USING (pline) JOIN af ON af.doc_id = b.doc_id
    ORDER BY b.doc_id"""

  /** q173: anchor-text BM25F — the q85 body replay plus the anchor
    * field rebuilt closed-form: per 50-bucket hub, inlink counts split
    * by the %5 anchor-phrase residue ("join window" × c_jw, "misc
    * link" × c_ml — only two distinct phrases, so the top-3 election
    * keeps both exactly); anchor tf = phrase counts × per-phrase term
    * occurrences, anchor dl = 2·(c_jw + c_ml); idf from the body only;
    * per-field length normalization, weight-2 anchor fusion, single
    * saturation, and the 6-dp rounded (bm25f desc, doc_id) top-20 cut
    * — all mirroring the Spark expression's operation order. */
  /** The q173 CTE prefix (t … f — per-candidate per-term fused/body
    * contributions land in `f`) — shared by [[q173]] (and q179, whose
    * oracle IS q173's replay) and embedded into composite oracles that
    * blend a further signal onto the raw BM25F score (q184). */
  private val q173Ctes = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    w AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
            CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf0,
            CAST(len(list_filter(toks, x -> x = 'filter')) AS DOUBLE) AS tf1,
            CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf2
          FROM t),
    ac AS (SELECT doc_id - doc_id % 50 AS aid,
             CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
               AS DOUBLE) AS c_jw,
             CAST(sum(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END)
               AS DOUBLE) AS c_ml
           FROM documents GROUP BY 1),
    an AS (SELECT aid,
             c_jw AS atf0, CAST(0 AS DOUBLE) AS atf1, c_jw AS atf2,
             2.0 * c_jw + 2.0 * c_ml AS dla
           FROM ac),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM w),
    sa AS (SELECT avg(dla) AS avgdla FROM an WHERE dla > 0),
    j AS (SELECT w.doc_id, w.dl, w.tf0, w.tf1, w.tf2,
            coalesce(an.dla, 0.0) AS dla,
            coalesce(an.atf0, 0.0) AS atf0,
            coalesce(an.atf1, 0.0) AS atf1,
            coalesce(an.atf2, 0.0) AS atf2
          FROM w LEFT JOIN an ON an.aid = w.doc_id),
    sc AS (SELECT doc_id,
        ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) AS idf0,
        ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) AS idf1,
        ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) AS idf2,
        0.25 + 0.75 * dl / avgdl AS bb,
        0.25 + 0.75 * dla / avgdla AS ba,
        tf0, tf1, tf2, atf0, atf1, atf2, dla
      FROM j, st, sa
      WHERE greatest(tf0, tf1, tf2, atf0, atf1, atf2) > 0),
    f AS (SELECT doc_id,
        1.0 * tf0 / bb + (CASE WHEN dla > 0 THEN 2.0 * atf0 / ba
                               ELSE 0.0 END) AS t0,
        1.0 * tf1 / bb + (CASE WHEN dla > 0 THEN 2.0 * atf1 / ba
                               ELSE 0.0 END) AS t1,
        1.0 * tf2 / bb + (CASE WHEN dla > 0 THEN 2.0 * atf2 / ba
                               ELSE 0.0 END) AS t2,
        1.0 * tf0 / bb + 0.0 AS b0,
        1.0 * tf1 / bb + 0.0 AS b1,
        1.0 * tf2 / bb + 0.0 AS b2,
        idf0, idf1, idf2
      FROM sc)"""

  val q173: String = q173Ctes + """
    SELECT doc_id,
           round(idf0 * t0 * 2.2 / (t0 + 1.2)
               + idf1 * t1 * 2.2 / (t1 + 1.2)
               + idf2 * t2 * 2.2 / (t2 + 1.2), 6) AS bm25f,
           round(idf0 * b0 * 2.2 / (b0 + 1.2)
               + idf1 * b1 * 2.2 / (b1 + 1.2)
               + idf2 * b2 * 2.2 / (b2 + 1.2), 6) AS bm25_body
    FROM f
    ORDER BY bm25f DESC, doc_id LIMIT 20"""

  /** q184: centrality-blended artifact serving — the q173 BM25F replay
    * (CTEs t…f, both index lifecycles must be invisible) JOINED with
    * the q165 PageRank unroll (CTEs b…r5, the fold must be invisible),
    * then the static-rank blend: each candidate's hosting domain by
    * doc_id%8 over the 8 crawl hosts, prior = that domain's
    * 9-dp-fenced rank (coalesced to 0.0 — posture; every host is in
    * the graph), blended = round6(raw_bm25f + 0.5·prior), top-20 by
    * (blended desc, doc_id). The two CTE families are name-disjoint by
    * construction. */
  val q184: String = q173Ctes + "," + q165RankCtes + """,
    hb AS (SELECT f.doc_id,
             CASE WHEN f.doc_id % 8 = 0 THEN 'site0.example'
                  WHEN f.doc_id % 8 = 1 THEN 'site1.example'
                  WHEN f.doc_id % 8 = 2 THEN 'site2.example'
                  WHEN f.doc_id % 8 = 3 THEN 'site3.example'
                  WHEN f.doc_id % 8 = 4 THEN 'site4.example'
                  WHEN f.doc_id % 8 = 5 THEN 'news.example'
                  WHEN f.doc_id % 8 = 6 THEN 'redir.example'
                  ELSE 'shop.example' END AS domain,
             idf0 * t0 * 2.2 / (t0 + 1.2) + idf1 * t1 * 2.2 / (t1 + 1.2)
               + idf2 * t2 * 2.2 / (t2 + 1.2) AS raw
           FROM f),
    hj AS (SELECT hb.doc_id, hb.domain, coalesce(r.rnk, 0.0) AS prior,
             hb.raw
           FROM hb LEFT JOIN r5 r ON r.node = hb.domain)
    SELECT doc_id, domain, prior, round(raw, 6) AS bm25f,
           round(raw + 0.5 * prior, 6) AS blended
    FROM hj ORDER BY blended DESC, doc_id LIMIT 20"""

  /** q175: triage-routed image decode — a pure residue decision table:
    * the GATE is that the Spark side must reproduce it through the real
    * header walks (route/reason/dims from triage, never from the class)
    * AND real pixel decodes (mean_ok demands PNG-exact / JPEG-bounded
    * agreement with the planted pixels; a quarantined class that
    * somehow decoded, or a routed class that failed decode, reds the
    * flag). */
  val q175 = """
    SELECT doc_id,
      CASE WHEN doc_id % 6 IN (0, 3) THEN 'decode'
           WHEN doc_id % 6 = 1 THEN 'decode'
           WHEN doc_id % 6 = 2 THEN 'quarantine'
           WHEN doc_id % 6 = 4 THEN 'quarantine'
           ELSE 'decode_progressive' END AS route,
      CASE WHEN doc_id % 6 = 2 THEN 'unknown format'
           WHEN doc_id % 6 = 4 THEN 'truncated'
           ELSE '' END AS reason,
      CAST(CASE WHEN doc_id % 6 IN (2, 4) THEN -1 ELSE 8 END AS BIGINT)
        AS w,
      CAST(CASE WHEN doc_id % 6 IN (2, 4) THEN -1 ELSE 8 END AS BIGINT)
        AS h,
      CAST(CASE WHEN doc_id % 6 IN (2, 4) THEN 0 ELSE 64 END AS BIGINT)
        AS n_px,
      CAST(CASE WHEN doc_id % 6 IN (2, 4) THEN 0 ELSE 1 END AS BIGINT)
        AS mean_ok
    FROM documents ORDER BY doc_id"""

  /** q174: sitemap coverage audit — advertised side rebuilt from the
    * q170 urlset arithmetic (d11≠5 docs, entries 0 and 1; the entity
    * in entry 1's loc decodes; index docs advertise nothing), captured
    * side from the parity/`%9` plants with normalization folded in
    * (uppercase scheme/host lowers to the advertised form), one FULL
    * OUTER join, and the stale rule as a string-date compare (planted
    * month > March ⟺ d9 ≥ 3). */
  val q174 = """
    WITH t AS (SELECT doc_id, doc_id % 9 AS d9, doc_id % 3 AS d3,
        doc_id % 11 AS d11,
        CASE WHEN doc_id % 5 = 0 THEN 'example.com'
             WHEN doc_id % 5 = 1 THEN 'example.co.uk'
             WHEN doc_id % 5 = 2 THEN 'badsite.com'
             WHEN doc_id % 5 = 3 THEN 'example.org'
             ELSE 'site.com' END AS dom
      FROM documents),
    adv AS (
      SELECT 'https://' || dom || '/a/1?p=' || CAST(doc_id AS VARCHAR)
               AS url, dom,
             '2024-0' || CAST(d9 + 1 AS VARCHAR) || '-1' ||
               CAST(d3 AS VARCHAR) AS lastmod
      FROM t WHERE d11 <> 5
      UNION ALL
      SELECT 'https://' || dom || '/b/' || CAST(doc_id AS VARCHAR) ||
               '?x=1&y=2', dom, ''
      FROM t WHERE d11 <> 5),
    cap AS (
      SELECT 'https://' || dom || '/a/1?p=' || CAST(doc_id AS VARCHAR)
               AS url, dom
      FROM t WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'https://' || dom || '/c/' || CAST(doc_id AS VARCHAR), dom
      FROM t WHERE d9 = 0)
    SELECT coalesce(a.url, c.url) AS url,
           coalesce(a.dom, c.dom) AS domain,
           CASE WHEN a.url IS NOT NULL AND c.url IS NOT NULL THEN 'both'
                WHEN a.url IS NOT NULL THEN 'advertised_only'
                ELSE 'captured_only' END AS status,
           CAST(CASE WHEN a.url IS NOT NULL AND c.url IS NOT NULL
                      AND a.lastmod <> '' AND a.lastmod > '2024-03-15'
                 THEN 1 ELSE 0 END AS BIGINT) AS stale
    FROM adv a FULL OUTER JOIN cap c ON a.url = c.url
    ORDER BY url"""

  /** q176: trust-gated curation — the q100 stage-chain replay (same
    * `curationPrefix` CTEs, same kept/reason derivation) composed with
    * the q169 PPR unroll (CTEs t-prefixed to avoid the `edges`/`dg`
    * collisions), joined on the doc's planted q165 host; `admitted` is
    * the literal AND of the two signals and `trust` the 9-dp-fenced
    * r5 rank itself (0.0 for the unseeded, unreachable site hosts). */
  val q176: String = {
    val head = s"""
    $curationPrefix,
    tb AS (SELECT doc_id % 5 AS k, doc_id % 4 AS m FROM documents),
    tde AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS src,
             CASE WHEN m IN (0, 1) THEN 'news.example'
                  WHEN m = 2 THEN 'redir.example'
                  ELSE 'shop.example' END AS dst
      FROM tb
      UNION ALL
      SELECT 'site' || CAST(k AS VARCHAR) || '.example', 'news.example'
      FROM tb),
    tedges AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
               FROM tde GROUP BY 1, 2),
    tsrcs AS (SELECT 'site0.example' AS node
              UNION ALL SELECT 'site1.example'),
    tgnodes AS (SELECT DISTINCT node FROM (
      SELECT src AS node FROM tedges UNION ALL SELECT dst FROM tedges)),
    tnodes AS (SELECT DISTINCT node FROM (
      SELECT node FROM tgnodes UNION ALL SELECT node FROM tsrcs)),
    tns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tsrcs),
    toutw AS (SELECT src, sum(w) AS ow FROM tedges GROUP BY src),
    tnr AS (SELECT tnodes.node,
              CASE WHEN s.node IS NOT NULL THEN 1.0 / tns.n
                   ELSE 0.0 END AS rst
            FROM tnodes CROSS JOIN tns
            LEFT JOIN tsrcs s ON s.node = tnodes.node),
    tr0 AS (SELECT node, rst, floor(rst * 1e9 + 0.5) / 1e9 AS rnk
            FROM tnr)"""
    val its = (1 to 5).map { i =>
      s"""
    tc$i AS (SELECT e.dst AS node, sum(r.rnk * e.w / o.ow) AS inw
             FROM tedges e JOIN toutw o ON e.src = o.src
             JOIN tr${i - 1} r ON r.node = e.src
             GROUP BY e.dst),
    tdg$i AS (SELECT floor(coalesce(sum(r.rnk), 0.0) * 1e9 + 0.5) / 1e9
                AS dm
              FROM tr${i - 1} r LEFT JOIN toutw o ON o.src = r.node
              WHERE o.src IS NULL),
    tr$i AS (SELECT n.node, n.rst,
               floor(((1.0 - 0.85) * n.rst
                      + 0.85 * (coalesce(c.inw, 0.0) + tdg$i.dm * n.rst))
                     * 1e9 + 0.5) / 1e9 AS rnk
             FROM tnr n CROSS JOIN tdg$i
             LEFT JOIN tc$i c ON c.node = n.node)"""
    }.mkString(",")
    head + "," + its + """
    SELECT c.doc_id,
           'site' || CAST(c.doc_id % 5 AS VARCHAR) || '.example' AS domain,
           CAST(CASE WHEN p4.doc_id IS NOT NULL AND p5.doc_id IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS kept,
           CASE WHEN p1.doc_id IS NULL THEN 'rules'
                WHEN p2.doc_id IS NULL THEN 'repetition'
                WHEN p3.doc_id IS NULL THEN 'exact_dup'
                WHEN p4.doc_id IS NULL THEN 'near_dup'
                WHEN p5.doc_id IS NOT NULL THEN 'contaminated'
                ELSE 'kept' END AS reason,
           coalesce(t.rnk, 0.0) AS trust,
           CAST(CASE WHEN p4.doc_id IS NOT NULL AND p5.doc_id IS NULL
                      AND coalesce(t.rnk, 0.0) > 0.0
                 THEN 1 ELSE 0 END AS BIGINT) AS admitted
    FROM corpus c
    LEFT JOIN s1 p1 ON p1.doc_id = c.doc_id
    LEFT JOIN s2 p2 ON p2.doc_id = c.doc_id
    LEFT JOIN s3 p3 ON p3.doc_id = c.doc_id
    LEFT JOIN s4 p4 ON p4.doc_id = c.doc_id
    LEFT JOIN contam p5 ON p5.doc_id = c.doc_id
    LEFT JOIN tr5 t ON t.node =
      'site' || CAST(c.doc_id % 5 AS VARCHAR) || '.example'
    ORDER BY c.doc_id"""
  }

  /** q178: crawl frontier — the plantedUrl domain grid, the per-domain
    * slot window, the delay decision table (10 from the `*` group,
    * 2.5 as the smallest of the GraftBot group's repeated values with
    * the `*` group's 99 shadowed, defaults for the invalid / silent /
    * missing classes), and `fetch_at` as the literal product. */
  val q178 = """
    WITH t AS (SELECT doc_id,
        CASE WHEN doc_id % 5 = 0 THEN 'example.com'
             WHEN doc_id % 5 = 1 THEN 'example.co.uk'
             WHEN doc_id % 5 = 2 THEN 'badsite.com'
             WHEN doc_id % 5 = 3 THEN 'example.org'
             ELSE 'site.com' END AS domain
      FROM documents),
    r AS (SELECT doc_id, domain,
        row_number() OVER (PARTITION BY domain ORDER BY doc_id) - 1
          AS slot
      FROM t)
    SELECT doc_id, domain, CAST(slot AS BIGINT) AS slot,
           CASE WHEN domain = 'example.com' THEN 10.0
                WHEN domain = 'example.co.uk' THEN 2.5
                ELSE 1.0 END AS delay,
           slot * (CASE WHEN domain = 'example.com' THEN 10.0
                        WHEN domain = 'example.co.uk' THEN 2.5
                        ELSE 1.0 END) AS fetch_at
    FROM r ORDER BY doc_id"""

  /** q180: recrawl wave — the q174 audit replay filtered to the due
    * set (advertised-never-captured ∪ stale captures), then the q178
    * slot window per domain ordered by URL and the delay decision
    * table; fetch_at the literal product. */
  val q180 = """
    WITH t AS (SELECT doc_id, doc_id % 9 AS d9, doc_id % 3 AS d3,
        doc_id % 11 AS d11,
        CASE WHEN doc_id % 5 = 0 THEN 'example.com'
             WHEN doc_id % 5 = 1 THEN 'example.co.uk'
             WHEN doc_id % 5 = 2 THEN 'badsite.com'
             WHEN doc_id % 5 = 3 THEN 'example.org'
             ELSE 'site.com' END AS dom
      FROM documents),
    adv AS (
      SELECT 'https://' || dom || '/a/1?p=' || CAST(doc_id AS VARCHAR)
               AS url, dom,
             '2024-0' || CAST(d9 + 1 AS VARCHAR) || '-1' ||
               CAST(d3 AS VARCHAR) AS lastmod
      FROM t WHERE d11 <> 5
      UNION ALL
      SELECT 'https://' || dom || '/b/' || CAST(doc_id AS VARCHAR) ||
               '?x=1&y=2', dom, ''
      FROM t WHERE d11 <> 5),
    cap AS (
      SELECT 'https://' || dom || '/a/1?p=' || CAST(doc_id AS VARCHAR)
               AS url, dom
      FROM t WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'https://' || dom || '/c/' || CAST(doc_id AS VARCHAR), dom
      FROM t WHERE d9 = 0),
    au AS (SELECT coalesce(a.url, c.url) AS url,
             coalesce(a.dom, c.dom) AS domain,
             CASE WHEN a.url IS NOT NULL AND c.url IS NOT NULL THEN 'both'
                  WHEN a.url IS NOT NULL THEN 'advertised_only'
                  ELSE 'captured_only' END AS status,
             CASE WHEN a.url IS NOT NULL AND c.url IS NOT NULL
                   AND a.lastmod <> '' AND a.lastmod > '2024-03-15'
              THEN 1 ELSE 0 END AS stale
           FROM adv a FULL OUTER JOIN cap c ON a.url = c.url),
    due AS (SELECT * FROM au
            WHERE status = 'advertised_only' OR stale = 1),
    r AS (SELECT url, domain, status, stale,
            row_number() OVER (PARTITION BY domain ORDER BY url) - 1
              AS slot
          FROM due)
    SELECT url, domain, status, CAST(stale AS BIGINT) AS stale,
           CAST(slot AS BIGINT) AS slot,
           CASE WHEN domain = 'example.com' THEN 10.0
                WHEN domain = 'example.co.uk' THEN 2.5
                ELSE 1.0 END AS delay,
           slot * (CASE WHEN domain = 'example.com' THEN 10.0
                        WHEN domain = 'example.co.uk' THEN 2.5
                        ELSE 1.0 END) AS fetch_at
    FROM r ORDER BY url"""

  /** q181: incremental anchor corpus — per canonicalized target the
    * residue counts (hub anchors land on the redirect FINALS, m=2 on
    * the unterminated self-cycle URL; News on the static URL; the
    * intra-domain Nav on each site host), then the (count desc, anchor
    * asc) election — the q166 convention over the q165 plant. */
  val q181 = """
    WITH b AS (SELECT doc_id % 5 AS k, doc_id % 4 AS m FROM documents),
    an AS (
      SELECT CASE WHEN m IN (0, 1) THEN 'https://news.example/final0'
                  WHEN m = 2 THEN 'https://redir.example/r2'
                  ELSE 'https://shop.example/final3' END AS target,
             'Hub' AS anchor FROM b
      UNION ALL
      SELECT 'https://news.example/static', 'News' FROM b
      UNION ALL
      SELECT 'https://site' || CAST(k AS VARCHAR) || '.example/local/nav',
             'Nav' FROM b),
    cnt AS (SELECT target, anchor, count(*) AS cnt FROM an GROUP BY 1, 2),
    rk AS (SELECT target, anchor, cnt,
             row_number() OVER (PARTITION BY target
                                ORDER BY cnt DESC, anchor ASC) AS rnk
           FROM cnt)
    SELECT target, CAST(rnk AS BIGINT) AS "rank", anchor,
           CAST(cnt AS BIGINT) AS cnt
    FROM rk WHERE rnk <= 3 ORDER BY target, "rank""""

  /** q141: exact substring dedup — brute-force replay over the literal
    * strings: EVERY (position, m) window for m in [16, n] — UNCAPPED, so
    * the Spark side's anchor-doubling extension past its band cap is
    * gated against true string equality — grouped by gram TEXT (not
    * fingerprints), maxdup per position, the exact left-maximality lag
    * (no cap-absorption clause), the coverage union, and the
    * post-removal string_agg digest. */
  val q141 = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    base AS (SELECT doc_id, len(toks) AS n, toks FROM t),
    gr AS (SELECT doc_id, p, m, array_to_string(toks[p:p+m-1], ' ') AS g
           FROM base,
                unnest(generate_series(1, n)) AS s(p),
                unnest(generate_series(16, n)) AS mm(m)
           WHERE p + m - 1 <= n),
    cnt AS (SELECT m, g FROM gr GROUP BY m, g HAVING count(*) >= 2),
    md AS (SELECT gr.doc_id, gr.p, max(gr.m) AS len
           FROM gr JOIN cnt ON cnt.m = gr.m AND cnt.g = gr.g
           GROUP BY gr.doc_id, gr.p),
    lm AS (SELECT doc_id, p, len,
             CASE WHEN lag(p) OVER w IS NULL OR lag(p) OVER w != p - 1
                       OR NOT (lag(len) OVER w >= len + 1)
                  THEN 1 ELSE 0 END AS left_max
           FROM md WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
    spn AS (SELECT doc_id, sum(left_max) AS n_spans, max(len) AS max_len
            FROM lm GROUP BY doc_id),
    covi AS (SELECT DISTINCT doc_id, i
             FROM (SELECT doc_id, unnest(generate_series(p, p + len - 1)) AS i
                   FROM md)),
    cv AS (SELECT doc_id, count(*) AS covered FROM covi GROUP BY doc_id),
    pos AS (SELECT doc_id, i, toks[i] AS w
            FROM base, unnest(generate_series(1, n)) AS s(i)),
    kept AS (SELECT pos.doc_id,
                    md5(coalesce(string_agg(pos.w, ' ' ORDER BY pos.i), ''))
                      AS kept_md5
             FROM pos ANTI JOIN covi USING (doc_id, i)
             GROUP BY pos.doc_id)
    SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
           CAST(coalesce(spn.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(spn.max_len, 0) AS BIGINT) AS max_len,
           CAST(coalesce(cv.covered, 0) AS BIGINT) AS covered,
           round(CASE WHEN b.n = 0 THEN 0.0
                 ELSE CAST(coalesce(cv.covered, 0) AS DOUBLE) / CAST(b.n AS DOUBLE)
                 END, 6) AS covered_frac,
           coalesce(kept.kept_md5, md5('')) AS kept_md5
    FROM base b
    LEFT JOIN spn USING (doc_id)
    LEFT JOIN cv USING (doc_id)
    LEFT JOIN kept USING (doc_id)
    ORDER BY b.doc_id"""

  /** q138: byte-fallback BPE encode — q103's 40-merge chain served with
    * the corpus symbol vocabulary MINUS every 'e'-bearing symbol; a
    * pruned-away symbol emits its UTF-8 bytes at ids `|vocab| + byte`
    * (hex-digit arithmetic — the md5 device pointed at `hex(encode(sym))`),
    * interleaved into the (word, symbol, byte) position order. */
  val q138: String =
    s"""
    WITH ${bpeChainCtes(40)},
    d3 AS MATERIALIZED (SELECT doc_id, wpos, j, syms[j] AS sym
           FROM (SELECT doc_id, wpos, syms,
                   unnest(generate_series(1, len(syms))) AS j
                 FROM d3a)),
    vid AS MATERIALIZED (
        SELECT sym, CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS id
        FROM (SELECT DISTINCT sym FROM d3) WHERE sym NOT LIKE '%e%'),
    e2 AS (SELECT d3.doc_id, d3.wpos, d3.j, 0 AS k, v.id AS tid
           FROM d3 JOIN vid v USING (sym)
           UNION ALL
           SELECT doc_id, wpos, j, k,
             (SELECT count(*) FROM vid)
             + (strpos('0123456789abcdef',
                  substr(lower(hex(encode(sym))), 2 * k - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                  substr(lower(hex(encode(sym))), 2 * k, 1)) - 1) AS tid
           FROM (SELECT doc_id, wpos, j, sym,
                   unnest(generate_series(1, octet_length(encode(sym)))) AS k
                 FROM d3 WHERE sym NOT IN (SELECT sym FROM vid))),
    e3 AS (SELECT doc_id, CAST(tid AS BIGINT) AS tid,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, j, k) AS BIGINT) AS pos
           FROM e2),
    docrows AS (SELECT 'doc' AS kind, CAST(doc_id AS BIGINT) AS key,
                  '' AS lft, '' AS rgt,
                  CAST(count(*) AS BIGINT) AS n1, CAST(sum(tid) AS BIGINT) AS n2,
                  CAST(sum(pos * tid) AS BIGINT) AS n3
                FROM e3 GROUP BY doc_id)
    SELECT * FROM (${bpeMergeRowsSql(40)} UNION ALL SELECT * FROM docrows)
    ORDER BY kind, key"""

  // Sequence packing over REAL BPE token counts (the q103 chain's bcnt —
  // budgets denominated in what a subword tokenizer would emit, not the
  // whitespace heuristic), then the plain window-cumsum replay of the
  // range-partitioned concat-and-cut.
  val q61bpe: String = s"""
    WITH ${bpeChainCtes(40)},
    t AS (SELECT d.doc_id, coalesce(b.btok, CAST(0 AS BIGINT)) AS tok
          FROM documents d LEFT JOIN bcnt b ON b.doc_id = d.doc_id),
    c AS (SELECT doc_id, tok, sum(tok) OVER (ORDER BY doc_id) AS cum FROM t)
    SELECT doc_id,
           CAST(tok AS BIGINT) AS n_tok,
           CAST((cum - tok) // 512 AS BIGINT) AS first_bin,
           CAST(CASE WHEN tok > 0 THEN (cum - 1) // 512
                     ELSE (cum - tok) // 512 END AS BIGINT) AS last_bin,
           CAST((cum - tok) % 512 AS BIGINT) AS bin_off
    FROM c ORDER BY doc_id"""

  // Token-budget mixture plan over REAL BPE token counts; weights stay
  // FP-exact powers of two so the literal arithmetic matches Spark.
  val q88bpe: String = s"""
    WITH ${bpeChainCtes(40)},
    t AS (SELECT d.lang AS domain, coalesce(b.btok, CAST(0 AS BIGINT)) AS tk
          FROM documents d LEFT JOIN bcnt b ON b.doc_id = d.doc_id),
    a AS (SELECT domain, CAST(sum(tk) AS BIGINT) AS available_tokens,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM t GROUP BY domain),
    w AS (SELECT *, CAST(CASE domain WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.125
                         WHEN 'de' THEN 0.125 WHEN 'es' THEN 0.125
                         WHEN 'fr' THEN 0.125 ELSE 0.0 END AS DOUBLE) AS wt
          FROM a),
    e AS (SELECT *, round(wt * 100000, 2) AS target_tokens FROM w),
    f AS (SELECT *, round(CASE WHEN available_tokens > 0
                          THEN target_tokens / available_tokens
                          ELSE 0.0 END, 6) AS epochs FROM e)
    SELECT domain, available_tokens, n_docs, round(wt, 6) AS weight,
           target_tokens, epochs,
           round(least(epochs, 1.0), 6) AS sample_rate
    FROM f ORDER BY domain"""

  // Corpus drift, FULL replay: numeric 10-bin PSI histograms over the
  // combined min/max (empty buckets included — they carry PSI mass via the
  // 1e-4 clamp), categorical per-value PSI, per-column '__psi' totals
  // (sum of the 6-dp-rounded terms, re-rounded), and the add-one-smoothed
  // token KL over the union vocabulary. Mirrors Profiling.drift term by
  // term: raw fractions are long-count divisions (engine-identical), the
  // clamp happens only inside the PSI term.
  val q104 = """
    WITH s AS (SELECT doc_id % 2 AS p,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks,
                 lang, source, n_chars
               FROM documents),
    base AS (SELECT p, CAST(len(toks) AS DOUBLE) AS n_tok,
               CAST(n_chars AS DOUBLE) AS n_chars, lang, source, toks FROM s),
    nm AS (SELECT p, 'n_tok' AS "column", n_tok AS v FROM base
           UNION ALL SELECT p, 'n_chars', n_chars FROM base),
    nmv AS (SELECT * FROM nm WHERE v IS NOT NULL),
    nstats AS (SELECT "column", min(v) AS mn, max(v) AS mx,
                 CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
               FROM nmv GROUP BY "column"),
    nhist AS (SELECT nmv."column",
                CAST(CASE WHEN mx > mn
                     THEN least(floor((v - mn) / ((mx - mn) / 10.0)), 9.0)
                     ELSE 0.0 END AS BIGINT) AS bucket,
                CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
              FROM nmv JOIN nstats USING ("column") GROUP BY 1, 2),
    nframe AS (SELECT "column", na, nb, unnest(generate_series(0, 9)) AS bucket
               FROM nstats),
    nbkt AS (SELECT f."column", CAST(f.bucket AS VARCHAR) AS bucket,
               CASE WHEN f.na > 0
                    THEN CAST(coalesce(h.ca, 0) AS DOUBLE) / f.na ELSE 0.0 END AS pa,
               CASE WHEN f.nb > 0
                    THEN CAST(coalesce(h.cb, 0) AS DOUBLE) / f.nb ELSE 0.0 END AS pb
             FROM nframe f LEFT JOIN nhist h
               ON h."column" = f."column" AND h.bucket = f.bucket),
    cm AS (SELECT p, 'lang' AS "column", lang AS v FROM base
           UNION ALL SELECT p, 'source', source FROM base),
    cmv AS (SELECT * FROM cm WHERE v IS NOT NULL),
    ccnt AS (SELECT "column", v,
               CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
             FROM cmv GROUP BY "column", v),
    ctot AS (SELECT "column", CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb FROM ccnt GROUP BY "column"),
    cbkt AS (SELECT c."column", c.v AS bucket,
               CASE WHEN t.na > 0 THEN CAST(c.ca AS DOUBLE) / t.na ELSE 0.0 END AS pa,
               CASE WHEN t.nb > 0 THEN CAST(c.cb AS DOUBLE) / t.nb ELSE 0.0 END AS pb
             FROM ccnt c JOIN ctot t USING ("column")),
    allbkt AS (SELECT * FROM nbkt UNION ALL SELECT * FROM cbkt),
    terms AS (SELECT "column", bucket, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
                round((greatest(pa, 0.0001) - greatest(pb, 0.0001)) *
                      ln(greatest(pa, 0.0001) / greatest(pb, 0.0001)), 6) AS contrib
              FROM allbkt),
    psis AS (SELECT "column", '__psi' AS bucket, 0.0 AS p_a, 0.0 AS p_b,
               round(sum(contrib), 6) AS contrib
             FROM terms GROUP BY "column"),
    tka AS (SELECT w, CAST(count(*) AS BIGINT) AS ca
            FROM (SELECT unnest(toks) AS w FROM base WHERE p = 0) GROUP BY w),
    tkb AS (SELECT w, CAST(count(*) AS BIGINT) AS cb
            FROM (SELECT unnest(toks) AS w FROM base WHERE p = 1) GROUP BY w),
    tkj AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
            FROM tka FULL OUTER JOIN tkb USING (w)),
    tkstats AS (SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb,
                  CAST(count(*) AS BIGINT) AS v FROM tkj),
    klrow AS (SELECT 'toks' AS "column", '__kl' AS bucket, 0.0 AS p_a, 0.0 AS p_b,
                round(sum(pa * ln(pa / pb)), 6) AS contrib
              FROM (SELECT CAST(ca + 1 AS DOUBLE) / (ta + v) AS pa,
                           CAST(cb + 1 AS DOUBLE) / (tb + v) AS pb
                    FROM tkj CROSS JOIN tkstats))
    SELECT * FROM (SELECT * FROM terms UNION ALL SELECT * FROM psis
                   UNION ALL SELECT * FROM klrow)
    ORDER BY "column", bucket"""

  // Hybrid RRF fusion, FULL replay: the BM25 leg re-derives the q85 scan
  // arithmetic (the indexed server is bit-identical by contract), the
  // cosine leg re-derives the q16 arithmetic against query vec 0, and the
  // fusion replays per-leg ranks, the 1/(60+rank) sums, and the fused
  // k-boundary (rrf desc, doc_id).
  val q105: String = s"""
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
               FROM documents),
    w AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
            CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf0,
            CAST(len(list_filter(toks, x -> x = 'filter')) AS DOUBLE) AS tf1,
            CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf2
          FROM t),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM w),
    bmleg AS (SELECT doc_id,
           round(ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
        FROM w, st
        WHERE greatest(tf0, tf1, tf2) > 0
        ORDER BY score DESC, doc_id LIMIT 20),
    cosleg AS (SELECT c.vec_id AS doc_id,
                 round(${cosineD("c.embedding", "q.embedding")}, 6) AS score
               FROM embeddings c, (SELECT embedding FROM embeddings
                                   WHERE vec_id = 0) q
               ORDER BY score DESC, doc_id LIMIT 20),
    u AS (SELECT 'bm25' AS leg, doc_id, score FROM bmleg
          UNION ALL SELECT 'cos', doc_id, score FROM cosleg),
    r AS (SELECT leg, doc_id,
            CAST(row_number() OVER (PARTITION BY leg ORDER BY score DESC, doc_id) AS BIGINT) AS rk
          FROM u),
    f AS (SELECT doc_id,
            coalesce(max(CASE WHEN leg = 'bm25' THEN rk END), -1) AS rank_bm25,
            coalesce(max(CASE WHEN leg = 'cos' THEN rk END), -1) AS rank_cos,
            round(sum(1.0 / (60.0 + rk)), 6) AS rrf
          FROM r GROUP BY doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rank_bm25 AS BIGINT) AS rank_bm25,
           CAST(rank_cos AS BIGINT) AS rank_cos, rrf
    FROM f ORDER BY rrf DESC, doc_id LIMIT 20"""

  // Embedding drift: the q104 numeric-PSI machinery over two vector-derived
  // columns — cosine to the FIXED reference vector (vec 0) and L2 norm,
  // both per-row left-to-right folds (the q16-proven portable device).
  val q106: String = s"""
    WITH b0 AS (SELECT e.vec_id % 2 AS p,
                  ${cosineD("e.embedding", "r.embedding")} AS cos_ref,
                  sqrt(${normSqD("e.embedding")}) AS norm
                FROM embeddings e,
                     (SELECT embedding FROM embeddings WHERE vec_id = 0) r),
    nm AS (SELECT p, 'cos_ref' AS "column", cos_ref AS v FROM b0
           UNION ALL SELECT p, 'norm', norm FROM b0),
    nmv AS (SELECT * FROM nm WHERE v IS NOT NULL),
    nstats AS (SELECT "column", min(v) AS mn, max(v) AS mx,
                 CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
               FROM nmv GROUP BY "column"),
    nhist AS (SELECT nmv."column",
                CAST(CASE WHEN mx > mn
                     THEN least(floor((v - mn) / ((mx - mn) / 10.0)), 9.0)
                     ELSE 0.0 END AS BIGINT) AS bucket,
                CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
              FROM nmv JOIN nstats USING ("column") GROUP BY 1, 2),
    nframe AS (SELECT "column", na, nb, unnest(generate_series(0, 9)) AS bucket
               FROM nstats),
    nbkt AS (SELECT f."column", CAST(f.bucket AS VARCHAR) AS bucket,
               CASE WHEN f.na > 0
                    THEN CAST(coalesce(h.ca, 0) AS DOUBLE) / f.na ELSE 0.0 END AS pa,
               CASE WHEN f.nb > 0
                    THEN CAST(coalesce(h.cb, 0) AS DOUBLE) / f.nb ELSE 0.0 END AS pb
             FROM nframe f LEFT JOIN nhist h
               ON h."column" = f."column" AND h.bucket = f.bucket),
    terms AS (SELECT "column", bucket, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
                round((greatest(pa, 0.0001) - greatest(pb, 0.0001)) *
                      ln(greatest(pa, 0.0001) / greatest(pb, 0.0001)), 6) AS contrib
              FROM nbkt),
    psis AS (SELECT "column", '__psi' AS bucket, 0.0 AS p_a, 0.0 AS p_b,
               round(sum(contrib), 6) AS contrib
             FROM terms GROUP BY "column")
    SELECT * FROM (SELECT * FROM terms UNION ALL SELECT * FROM psis)
    ORDER BY "column", bucket"""

  // FLAC round-trip: identical replay to q52 — FLAC is lossless, so the
  // Spark side's encode → spec-complete decode (CRCs + in-band MD5
  // verified) must reproduce the source samples exactly; flac_ok pins the
  // Spark-side elementwise decoded==input and MD5 verdicts.
  val q107 = """
    WITH s AS (SELECT user_id,
                      CAST(GREATEST(LEAST(floor(value * 60), 32767), -32768) AS BIGINT) AS q
               FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(q * q) AS BIGINT) AS sum_q2,
           CAST(max(q) AS BIGINT) AS peak_q,
           CAST(1 AS BIGINT) AS flac_ok
    FROM s GROUP BY user_id ORDER BY user_id"""

  // GMM EM trajectory replay (q108): one E/R/P CTE triple per iteration,
  // with all k components as COLUMNS of one row (no per-row window — the
  // synthetic fixtures have duplicate (orderkey, linenumber) pairs, so no
  // row-identity partition key exists). Every rounding fence mirrors
  // Gmm.fitDiag exactly: scores 12, responsibilities 9, updates 9 —
  // in the same left-to-right multiplication/addition order as Spark.
  private val gmmK = 3
  private def gmmPdf(x: String, m: String, sg: String) =
    s"(exp(-0.5*(p.$x-pr.$m)*(p.$x-pr.$m)/pr.$sg)/sqrt(2*pi()*pr.$sg))"
  // per-row fences replayed as the SAME floor arithmetic Gmm.fence uses
  private def gmmFence(expr: String, pow: String) =
    s"floor(($expr) * $pow + 0.5) / $pow"
  // weight * (pdf0 * pdf1) — parenthesised to match Gmm.responsibilities'
  // association exactly (reduceLeft over the pdfs first, THEN the weight);
  // IEEE multiplication is non-associative, so left-assoc SQL could differ
  // by an ulp right at a rounding-fence boundary
  private def gmmScores: String = (0 until gmmK).map(c =>
    gmmFence(s"pr.w$c * (${gmmPdf("x0", s"m${c}0", s"s${c}0")} * ${gmmPdf("x1", s"m${c}1", s"s${c}1")})",
      "1000000000000.0") + s" AS sc$c")
    .mkString(", ")
  private def gmmResps: String = {
    val tot = (0 until gmmK).map(c => s"sc$c").mkString(" + ")
    (0 until gmmK).map(c =>
      gmmFence(s"sc$c / greatest($tot, 1e-30)", "1000000000.0") + s" AS r$c").mkString(", ")
  }
  private def gmmIter(i: Int): String = {
    val prev = s"p${i - 1}"
    def mU(c: Int, x: String) = s"round(sum(r$c*$x) / greatest(sum(r$c), 1e-12), 9)"
    val ps = (0 until gmmK).flatMap { c =>
      s"round(sum(r$c) / max(gg.n), 9) AS w$c" +: (0 until 2).map { j =>
        val x = s"x$j"
        s"${mU(c, x)} AS m$c$j, " +
          s"round(greatest(sum(r$c*$x*$x) / greatest(sum(r$c), 1e-12) - ${mU(c, x)}*${mU(c, x)}, 0.000001), 9) AS s$c$j"
      }
    }.mkString(", ")
    s"""
    e$i AS (SELECT p.x0, p.x1, $gmmScores FROM gpts p CROSS JOIN $prev pr),
    r$i AS (SELECT x0, x1, $gmmResps FROM e$i),
    p$i AS (SELECT $ps FROM r$i, gg)"""
  }

  val q108: String = {
    val initPivot = (0 until gmmK).flatMap { c =>
      s"round(1.0/3, 9) AS w$c" +: (0 until 2).map(j =>
        // greatest(·, varFloor) mirrors fitDiag's init floor — without it
        // a near-constant feature (var_pop < 1e-6) would divide by ~zero
        // here while Spark proceeds floored
        s"max(CASE WHEN c = $c THEN x$j END) AS m$c$j, greatest(max(gg.v$j), 0.000001) AS s$c$j")
    }.mkString(", ")
    val outRows = (0 until gmmK).map { c =>
      s"""SELECT CAST($c AS BIGINT) AS component, round(p.w$c, 6) AS weight,
           round(p.m${c}0, 6) AS mean_qty, round(p.s${c}0, 6) AS var_qty,
           round(p.m${c}1, 6) AS mean_tax, round(p.s${c}1, 6) AS var_tax,
           CAST(coalesce((SELECT n FROM gcnt WHERE comp = $c), 0) AS BIGINT) AS n_assigned
         FROM p3 p"""
    }.mkString(" UNION ALL ")
    s"""
    WITH gpts AS (SELECT concat_ws('|', l_orderkey, l_linenumber) AS key,
                    CAST(l_quantity AS DOUBLE) AS x0, CAST(l_tax AS DOUBLE) AS x1
                  FROM lineitem),
    gg AS (SELECT CAST(count(*) AS DOUBLE) AS n, round(var_pop(x0), 9) AS v0,
                  round(var_pop(x1), 9) AS v1 FROM gpts),
    gh AS (SELECT *, substr(md5(concat_ws('|', key, 'gmm')), 1, 13) AS hx FROM gpts),
    gu AS (SELECT *, list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, 13),
                 k -> CAST(strpos('0123456789abcdef', substr(hx, k, 1)) - 1 AS DOUBLE)
                      * pow(16.0, 13 - k))),
             (a, x) -> a + x) / 4503599627370496.0 AS u
           FROM gh),
    ginit AS (SELECT row_number() OVER (ORDER BY u, key, x0, x1) - 1 AS c, x0, x1
              FROM gu ORDER BY u, key, x0, x1 LIMIT $gmmK),
    p0 AS (SELECT $initPivot FROM ginit, gg),
    ${gmmIter(1)},
    ${gmmIter(2)},
    ${gmmIter(3)},
    e4 AS (SELECT p.x0, p.x1, $gmmScores FROM gpts p CROSS JOIN p3 pr),
    r4 AS (SELECT x0, x1, $gmmResps FROM e4),
    ga AS (SELECT CASE WHEN r0 >= r1 AND r0 >= r2 THEN 0
                       WHEN r1 >= r2 THEN 1 ELSE 2 END AS comp
           FROM r4),
    gcnt AS (SELECT comp, count(*) AS n FROM ga GROUP BY comp)
    SELECT * FROM ($outRows) ORDER BY component"""
  }

  // Ranking-metrics replay (q109): per-user value ranking, purchase
  // judgments, every DCG gain term / ideal ordering / full-ranking MRR
  // recomputed from the raw table.
  val q109 = """
    WITH rk AS (SELECT user_id AS qid, event_id AS doc_id,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY value DESC, event_id) AS rank
                FROM events),
    j AS (SELECT user_id AS qid, event_id AS doc_id,
                 1.0 + (event_id % 3) AS grade
          FROM events WHERE event_type = 'purchase'),
    h AS (SELECT rk.qid, rk.doc_id, rk.rank, coalesce(j.grade, 0.0) AS grade
          FROM rk LEFT JOIN j ON j.qid = rk.qid AND j.doc_id = rk.doc_id),
    realized AS (SELECT qid,
                   sum(CASE WHEN grade > 0
                       THEN (pow(2.0, grade) - 1) / (ln(rank + 1) / ln(2.0))
                       ELSE 0.0 END) AS dcg,
                   sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS hits_k
                 FROM h WHERE rank <= 10 GROUP BY qid),
    m AS (SELECT qid, 1.0 / min(rank) AS mrr FROM h WHERE grade > 0 GROUP BY qid),
    iw AS (SELECT qid, grade,
             row_number() OVER (PARTITION BY qid ORDER BY grade DESC, doc_id) AS ipos
           FROM j WHERE grade > 0),
    ideal AS (SELECT qid,
                sum(CASE WHEN ipos <= 10
                    THEN (pow(2.0, grade) - 1) / (ln(ipos + 1) / ln(2.0))
                    ELSE 0.0 END) AS idcg,
                count(*) AS n_rel
              FROM iw GROUP BY qid),
    q AS (SELECT DISTINCT qid FROM rk)
    SELECT q.qid,
           round(CASE WHEN coalesce(ideal.idcg, 0.0) > 0
                 THEN coalesce(realized.dcg, 0.0) / ideal.idcg ELSE 0.0 END, 6) AS ndcg,
           round(coalesce(m.mrr, 0.0), 6) AS mrr,
           round(CASE WHEN coalesce(ideal.n_rel, 0) > 0
                 THEN CAST(coalesce(realized.hits_k, 0) AS DOUBLE) / ideal.n_rel
                 ELSE 0.0 END, 6) AS recall_k,
           round(CAST(coalesce(realized.hits_k, 0) AS DOUBLE) / 10, 6) AS precision_k,
           CAST(coalesce(ideal.n_rel, 0) AS BIGINT) AS n_rel
    FROM q LEFT JOIN realized ON realized.qid = q.qid
           LEFT JOIN m ON m.qid = q.qid
           LEFT JOIN ideal ON ideal.qid = q.qid
    ORDER BY q.qid"""

  // Kneser-Ney trigram replay (q110): rebuild the trigram / continuation /
  // bigram count tables from the 'en' slice, re-derive both discounts from
  // the count-of-counts census, then replay every interpolation term with
  // the exact operator ordering LangModel.knTrigramCrossEntropy uses.
  // shared KN-trigram census CTEs (q110 scoring + q118 reweighting)
  private val knCtes = """t AS (SELECT doc_id, lang,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    tg AS (SELECT doc_id, lang, toks[i-2] AS a, toks[i-1] AS b, toks[i] AS c
           FROM t, unnest(generate_series(3, len(toks))) AS u(i)),
    tri AS (SELECT a, b, c, count(*) AS c3 FROM tg WHERE lang = 'en' GROUP BY a, b, c),
    ctx2 AS (SELECT a, b, sum(c3) AS den3, count(*) AS uniq3 FROM tri GROUP BY a, b),
    mid AS (SELECT b, c, count(*) AS n3bc FROM tri GROUP BY b, c),
    ctx1 AS (SELECT b, sum(n3bc) AS den2, count(*) AS uniq2 FROM mid GROUP BY b),
    bgr AS (SELECT toks[i-1] AS b, toks[i] AS c
            FROM t, unnest(generate_series(2, len(toks))) AS u(i)
            WHERE lang = 'en'),
    bi AS (SELECT b, c, count(*) AS cb FROM bgr GROUP BY b, c),
    unic AS (SELECT c, count(*) AS n2c FROM bi GROUP BY c),
    tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM bi) AS bb,
                   (SELECT CAST(count(DISTINCT w) AS DOUBLE)
                    FROM (SELECT unnest(toks) AS w FROM t WHERE lang = 'en')) AS v),
    d3 AS (SELECT CASE WHEN n1 + 2.0*n2 > 0 THEN n1/(n1 + 2.0*n2) ELSE 0.5 END AS dd3
           FROM (SELECT CAST(sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
                        CAST(sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2
                 FROM tri)),
    d2 AS (SELECT CASE WHEN n1 + 2.0*n2 > 0 THEN n1/(n1 + 2.0*n2) ELSE 0.5 END AS dd2
           FROM (SELECT CAST(sum(CASE WHEN n3bc = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
                        CAST(sum(CASE WHEN n3bc = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2
                 FROM mid)),
    s1 AS (SELECT g.doc_id,
             CAST(coalesce(tri.c3, 0) AS DOUBLE) AS c3v,
             CAST(coalesce(ctx2.den3, 0) AS DOUBLE) AS den3v,
             CAST(coalesce(ctx2.uniq3, 0) AS DOUBLE) AS uniq3v,
             CAST(coalesce(mid.n3bc, 0) AS DOUBLE) AS n3bcv,
             CAST(coalesce(ctx1.den2, 0) AS DOUBLE) AS den2v,
             CAST(coalesce(ctx1.uniq2, 0) AS DOUBLE) AS uniq2v,
             (CAST(coalesce(unic.n2c, 0) AS DOUBLE) + 1.0) / (tot.bb + tot.v + 1.0) AS p1,
             d3.dd3, d2.dd2
           FROM tg g
           LEFT JOIN tri ON tri.a = g.a AND tri.b = g.b AND tri.c = g.c
           LEFT JOIN ctx2 ON ctx2.a = g.a AND ctx2.b = g.b
           LEFT JOIN mid ON mid.b = g.b AND mid.c = g.c
           LEFT JOIN ctx1 ON ctx1.b = g.b
           LEFT JOIN unic ON unic.c = g.c
           CROSS JOIN tot CROSS JOIN d3 CROSS JOIN d2),
    s2 AS (SELECT *, CASE WHEN den2v > 0
             THEN greatest(n3bcv - dd2, 0.0) / den2v + dd2 * uniq2v / den2v * p1
             ELSE p1 END AS p2
           FROM s1),
    s3 AS (SELECT *, CASE WHEN den3v > 0
             THEN greatest(c3v - dd3, 0.0) / den3v + dd3 * uniq3v / den3v * p2
             ELSE p2 END AS p3
           FROM s2),
    s4 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                  round(sum(-ln(p3)) / CAST(count(*) AS DOUBLE), 6) AS ce
           FROM s3 GROUP BY doc_id)"""

  val q110: String = s"""
    WITH $knCtes
    SELECT doc_id, n_trigrams, ce FROM s4 ORDER BY doc_id"""

  // CE-driven source reweighting (q118): per-source mean KN cross-entropy
  // tilted into sampling shares via exp(-(ce - min_ce)/tau) — the
  // DoReMi-flavoured "sample more of what the reference LM finds clean"
  // composition of q110's census with q113's epoch machinery.
  val q118: String = s"""
    WITH $knCtes,
    bysrc AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
                round(avg(k.ce), 9) AS mean_ce
              FROM documents d JOIN s4 k ON k.doc_id = d.doc_id
              GROUP BY d.source),
    mn AS (SELECT min(mean_ce) AS m FROM bysrc),
    tl AS (SELECT source, n_docs, mean_ce,
             round(exp(-(mean_ce - mn.m) / 0.5), 9) AS tilt
           FROM bysrc, mn),
    zz AS (SELECT sum(tilt) AS z FROM tl),
    ww AS (SELECT source, n_docs, mean_ce,
             round(tilt / zz.z, 9) AS share,
             round(tilt / zz.z * 10000.0 / CAST(n_docs AS DOUBLE), 9) AS weight
           FROM tl, zz),
    dd AS (SELECT d.doc_id, d.source, w.weight,
                  substr(md5(concat_ws('|', d.doc_id, 'ce')), 1, 13) AS hx
           FROM documents d JOIN s4 k ON k.doc_id = d.doc_id
           JOIN ww w ON w.source = d.source),
    uu AS (SELECT *, list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, 13),
                 kk -> CAST(strpos('0123456789abcdef', substr(hx, kk, 1)) - 1 AS DOUBLE)
                      * pow(16.0, 13 - kk))),
             (a, x) -> a + x) / 4503599627370496.0 AS u
           FROM dd),
    ee AS (SELECT source,
                  sum(CAST(floor(weight) AS BIGINT) +
                      CASE WHEN u < weight - floor(weight) THEN 1 ELSE 0 END) AS n_sampled
           FROM uu GROUP BY source)
    SELECT w.source, w.n_docs, w.mean_ce, w.share, w.weight,
           CAST(coalesce(ee.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM ww w LEFT JOIN ee ON ee.source = w.source ORDER BY w.source"""

  // HLL cardinality sketches (q111): the oracle replays the EXACT side
  // (row/batch/distinct counts); the sketch estimates are gated by the
  // Spark-side pinned flags (union==full-rescan equality + 5% accuracy),
  // the q48 approx-anchor convention.
  val q111 = """
    SELECT * FROM (
      SELECT 'user_id' AS "column",
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(3 AS BIGINT) AS n_batches,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
             CAST(1 AS BIGINT) AS apx_ok, CAST(1 AS BIGINT) AS merge_ok
      FROM events
      UNION ALL
      SELECT 'event_type', CAST(count(*) AS BIGINT), CAST(3 AS BIGINT),
             CAST(count(DISTINCT event_type) AS BIGINT),
             CAST(1 AS BIGINT), CAST(1 AS BIGINT)
      FROM events) ORDER BY "column""""

  // JSONL round-trip (q112): the Spark side produced these rows by
  // exporting documents to newline-delimited JSON (with 2 planted corrupt
  // lines, require-gated to quarantine) and reading them back through the
  // schema-enforced PERMISSIVE reader — the oracle is the parquet
  // original, so any JSON escape/unescape/null defect breaks the hash.
  val q112 = """
    SELECT doc_id, lang, md5(coalesce(text, '')) AS text_md5
    FROM documents ORDER BY doc_id"""

  // CSV round-trip (q120): same contract as q112 for the CSV reader —
  // the Spark side exported documents as headerless CSV with 2 planted
  // malformed lines (require-gated to quarantine) and read them back
  // PERMISSIVE; the oracle is the parquet original.
  val q120 = """
    SELECT doc_id, lang, md5(coalesce(text, '')) AS text_md5
    FROM documents ORDER BY doc_id"""

  // q122: the ORC round-trip gate — digests of the parquet original under
  // the same pushdown filter; the ORC read must reproduce them exactly.
  val q122 = """
    SELECT doc_id, lang, n_chars, md5(coalesce(text, '')) AS text_md5
    FROM documents WHERE n_chars >= 200 ORDER BY doc_id"""

  // q123: the PageRank trajectory, all 5 iterations unrolled as CTE blocks.
  // Arithmetic mirrors LinkAnalysis.pageRank exactly: contribution
  // (rnk * w) / ow left-assoc, base (1.0 - 0.85)/n (NOT the literal 0.15 —
  // a different double), 9-dp floor fence after every iteration. The
  // purchase graph has no dangling nodes (both edge directions are
  // materialized), so the Spark side's dangling term is exactly 0.0 and
  // adding it is the IEEE identity — the replay omits it.
  val q123: String = {
    val head = """
    WITH el AS (
      SELECT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn,
             CAST(count(*) AS DOUBLE) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    edges AS (SELECT cn AS src, sn AS dst, w FROM el
              UNION ALL SELECT sn AS src, cn AS dst, w FROM el),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    r0 AS (SELECT node, floor(1.0 / nn.n * 1e9 + 0.5) / 1e9 AS rnk
           FROM nodes, nn)"""
    val its = (1 to 5).map { i =>
      s"""
    c$i AS (SELECT e.dst AS node, sum(r.rnk * e.w / o.ow) AS inw
            FROM edges e JOIN outw o ON e.src = o.src
            JOIN r${i - 1} r ON r.node = e.src
            GROUP BY e.dst),
    r$i AS (SELECT n.node,
              floor(((1.0 - 0.85) / nn.n + 0.85 * coalesce(c.inw, 0.0))
                    * 1e9 + 0.5) / 1e9 AS rnk
            FROM nodes n CROSS JOIN nn LEFT JOIN c$i c ON c.node = n.node)"""
    }.mkString(",")
    head + "," + its + """
    SELECT node, rnk AS "rank" FROM r5 ORDER BY node"""
  }

  // q147: the personalized-PageRank trajectory, all 5 iterations unrolled.
  // Same edge/out-weight CTEs as q123, plus: the seed set (nation-0
  // customers, DISTINCT), a node universe that UNIONs off-graph seeds in,
  // the per-node restart mass rst = 1/|S| on seeds else 0.0, the
  // per-iteration dangling scalar (rank mass on nodes with no out-edges —
  // the orderless seeds), and the (1.0-0.85)*rst + 0.85*(in + dm*rst)
  // association with the 9-dp floor fence, mirroring
  // LinkAnalysis.personalizedPageRank term for term.
  val q147: String = {
    val head = """
    WITH el AS (
      SELECT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn,
             CAST(count(*) AS DOUBLE) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    edges AS (SELECT cn AS src, sn AS dst, w FROM el
              UNION ALL SELECT sn AS src, cn AS dst, w FROM el),
    srcs AS (SELECT DISTINCT c_custkey * 2 AS node
             FROM customer WHERE c_nationkey = 0),
    gnodes AS (SELECT DISTINCT src AS node FROM edges),
    nodes AS (SELECT node FROM gnodes UNION SELECT node FROM srcs),
    ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM srcs),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    nr AS (SELECT nodes.node,
             CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS rst
           FROM nodes CROSS JOIN ns LEFT JOIN srcs s ON s.node = nodes.node),
    r0 AS (SELECT node, rst, floor(rst * 1e9 + 0.5) / 1e9 AS rnk FROM nr)"""
    val its = (1 to 5).map { i =>
      s"""
    c$i AS (SELECT e.dst AS node, sum(r.rnk * e.w / o.ow) AS inw
            FROM edges e JOIN outw o ON e.src = o.src
            JOIN r${i - 1} r ON r.node = e.src
            GROUP BY e.dst),
    dg$i AS (SELECT floor(coalesce(sum(r.rnk), 0.0) * 1e9 + 0.5) / 1e9 AS dm
             FROM r${i - 1} r LEFT JOIN outw o ON o.src = r.node
             WHERE o.src IS NULL),
    r$i AS (SELECT n.node, n.rst,
              floor(((1.0 - 0.85) * n.rst
                     + 0.85 * (coalesce(c.inw, 0.0) + dg$i.dm * n.rst))
                    * 1e9 + 0.5) / 1e9 AS rnk
            FROM nr n CROSS JOIN dg$i LEFT JOIN c$i c ON c.node = n.node)"""
    }.mkString(",")
    head + "," + its + """
    SELECT node, rnk AS "rank" FROM r5 ORDER BY node"""
  }

  // q124/q126 shared grid: floor-of-epoch bucket arithmetic, per-bucket
  // rounded sums, generate_series grid per series span, IGNORE NULLS
  // forward-fill window — exactly TimeSeries.gapFill.
  private val gapGridCtes = """
    e AS (
      SELECT user_id,
             CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS bucket, value
      FROM events WHERE user_id % 10 = 0),
    obs AS (SELECT user_id, bucket, count(*) AS n_events,
                   round(sum(value), 2) AS vs
            FROM e GROUP BY 1, 2),
    spans AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
              FROM obs GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket
             FROM spans),
    j AS (SELECT g.user_id, g.bucket,
                 coalesce(o.n_events, 0) AS n_events,
                 CAST(CASE WHEN o.n_events IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled,
                 o.vs
          FROM grid g LEFT JOIN obs o
            ON o.user_id = g.user_id AND o.bucket = g.bucket),
    f AS MATERIALIZED (
      SELECT user_id, bucket, n_events, filled,
             last_value(vs IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_sum
      FROM j)"""

  val q124: String = "WITH " + gapGridCtes + """
    SELECT user_id, bucket, n_events, filled, value_sum
    FROM f ORDER BY user_id, bucket"""

  // q126: the EWMA recurrence over the dense gap-filled grid — the fill is
  // what makes "bucket + 1" a total per-series chain the recursive CTE can
  // walk. alpha = 0.5 is exactly representable, so 0.5*x + 0.5*y replays
  // the Spark fold bit-for-bit with no rounding fence.
  val q126: String = "WITH RECURSIVE " + gapGridCtes + """,
    base AS (SELECT user_id, min(bucket) AS b0 FROM f GROUP BY 1),
    r AS (
      SELECT f.user_id, f.bucket, f.value_sum, f.value_sum AS ewma
      FROM f JOIN base ON f.user_id = base.user_id AND f.bucket = base.b0
      UNION ALL
      SELECT f.user_id, f.bucket, f.value_sum,
             0.5 * f.value_sum + 0.5 * r.ewma AS ewma
      FROM f JOIN r ON f.user_id = r.user_id AND f.bucket = r.bucket + 1)
    SELECT user_id, bucket, value_sum, ewma FROM r ORDER BY user_id, bucket"""

  /** q125: the unigram-LM tokenizer, trained AND applied inside one
    * generated query (the q103 convention). Mirrors [[graft.operators.Unigram]]
    * term for term: substring seed with the multi-char cap and char
    * closure, per-EM-round Viterbi DP unrolled to MaxWordLen positions ×
    * maxPieceLen candidate lengths with the exact (score desc, pieces
    * asc, lastLen desc) tie order, list-prepend backtracks, char-floored
    * recounts, prune windows, and the 6-dp floor fence on every ln —
    * fenced because libm and JVM `log` may differ in the last ulp. Every
    * chain CTE is MATERIALIZED (the bpeOracle lesson: default inlining
    * doubles the plan per stage). */
  def unigramOracle(vocabSize: Int, maxPieceLen: Int, minCount: Long,
                    seedCap: Int, rounds: Int, maxLen: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
    WITH d0 AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS norm
                FROM documents),
    d1 AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(norm, '\\s+') AS toks
           FROM d0 WHERE length(norm) > 0),
    w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(toks) AS word FROM d1) GROUP BY word),
    sidx AS (SELECT word, freq, unnest(generate_series(1, length(word))) AS i FROM w0),
    sexp AS (SELECT word, freq, i, gl.l
             FROM sidx CROSS JOIN (SELECT unnest(generate_series(1, $maxPieceLen)) AS l) gl
             WHERE i + l - 1 <= length(word)),
    seed AS MATERIALIZED (SELECT substr(word, i, l) AS piece,
             CAST(sum(freq) AS BIGINT) AS cnt FROM sexp GROUP BY 1),
    chars0 AS MATERIALIZED (SELECT piece, cnt FROM seed WHERE length(piece) = 1),
    multi0 AS (SELECT piece, cnt FROM (
        SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
        FROM seed WHERE length(piece) > 1 AND cnt >= $minCount) WHERE rn <= $seedCap),
    vc0 AS (SELECT piece, cnt FROM chars0 UNION ALL SELECT piece, cnt FROM multi0),
    v0 AS MATERIALIZED (SELECT piece, cnt,
           floor(ln(CAST(cnt AS DOUBLE) /
                    (SELECT CAST(sum(cnt) AS DOUBLE) FROM vc0)) * 1e6 + 0.5) / 1e6 AS lp
         FROM vc0)"""
    for (p <- 0 to rounds) {
      sb ++= s""",
    dp${p}_0 AS (SELECT word, CAST(0.0 AS DOUBLE) AS s, 0 AS k, 0 AS l FROM w0)"""
      for (i <- 1 to maxLen) {
        val cands = (1 to math.min(maxPieceLen, i)).map { l =>
          s"""SELECT d.word, d.s + v.lp AS s, d.k + 1 AS k, $l AS l
              FROM dp${p}_${i - l} d JOIN v$p v
                ON v.piece = substr(d.word, ${i - l + 1}, $l)
              WHERE length(d.word) >= $i"""
        }.mkString(" UNION ALL ")
        sb ++= s""",
    dp${p}_$i AS MATERIALIZED (SELECT word, s, k, l FROM (
        SELECT word, s, k, l,
               row_number() OVER (PARTITION BY word ORDER BY s DESC, k ASC, l DESC) AS rn
        FROM ($cands)) WHERE rn = 1)"""
      }
      sb ++= s""",
    dpall$p AS MATERIALIZED (${(1 to maxLen).map(i =>
        s"SELECT word, $i AS i, l FROM dp${p}_$i").mkString(" UNION ALL ")}),
    bt${p}_0 AS (SELECT word, length(word) AS pos, CAST([] AS VARCHAR[]) AS seg FROM w0)"""
      for (j <- 1 to maxLen) {
        sb ++= s""",
    bt${p}_$j AS MATERIALIZED (
        SELECT b.word, b.pos - d.l AS pos,
               list_prepend(substr(b.word, b.pos - d.l + 1, d.l), b.seg) AS seg
        FROM bt${p}_${j - 1} b JOIN dpall$p d ON d.word = b.word AND d.i = b.pos
        WHERE b.pos > 0
        UNION ALL
        SELECT word, pos, seg FROM bt${p}_${j - 1} WHERE pos = 0)"""
      }
      sb ++= s""",
    segs$p AS MATERIALIZED (SELECT word, seg FROM bt${p}_$maxLen WHERE pos = 0)"""
      if (p < rounds) {
        sb ++= s""",
    cnt$p AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT w0.freq, unnest(s.seg) AS piece
        FROM segs$p s JOIN w0 USING (word)) GROUP BY 1),
    vc${p + 1} AS (
        SELECT c0.piece, CAST(greatest(coalesce(c.cnt, 0), 1) AS BIGINT) AS cnt
        FROM chars0 c0 LEFT JOIN cnt$p c ON c.piece = c0.piece
        UNION ALL
        SELECT piece, cnt FROM (
          SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
          FROM cnt$p WHERE length(piece) > 1)
        WHERE rn <= $vocabSize - (SELECT count(*) FROM chars0)),
    v${p + 1} AS MATERIALIZED (SELECT piece, cnt,
           floor(ln(CAST(cnt AS DOUBLE) /
                    (SELECT CAST(sum(cnt) AS DOUBLE) FROM vc${p + 1})) * 1e6 + 0.5) / 1e6 AS lp
         FROM vc${p + 1})"""
      }
    }
    sb ++= s""",
    vocabf AS MATERIALIZED (SELECT piece, cnt, lp,
           CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT) AS id FROM v$rounds),
    d2 AS (SELECT doc_id, i AS wpos, toks[i] AS word
           FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
                 FROM d1)),
    d3a AS MATERIALIZED (SELECT d2.doc_id, d2.wpos, d2.word, s.seg
           FROM d2 LEFT JOIN segs$rounds s USING (word)),"""
    // A word with no lattice path never backtracks to pos = 0, so it
    // falls out of segs; the operator byte-falls-back (ids |vocabf| +
    // byte), and the oracle synthesizes the same rows from the LEFT-join
    // miss. Unreachable for q125's closed corpus (single-char closure).
    sb ++= s"""
    d3 AS (SELECT doc_id, wpos, j, seg[j] AS piece, CAST(NULL AS BIGINT) AS bid
           FROM (SELECT doc_id, wpos, seg,
                   unnest(generate_series(1, len(seg))) AS j FROM d3a
                 WHERE seg IS NOT NULL)
           UNION ALL
           SELECT doc_id, wpos, k AS j, NULL AS piece,
             CAST((SELECT count(*) FROM vocabf)
             + (strpos('0123456789abcdef',
                  substr(lower(hex(encode(word))), 2 * k - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                  substr(lower(hex(encode(word))), 2 * k, 1)) - 1) AS BIGINT) AS bid
           FROM (SELECT doc_id, wpos, word,
                   unnest(generate_series(1, octet_length(encode(word)))) AS k
                 FROM d3a WHERE seg IS NULL)),
    d4 AS (SELECT doc_id, piece, bid,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, j) AS BIGINT) AS pos
           FROM d3),
    docrows AS (SELECT 'doc' AS kind, CAST(doc_id AS BIGINT) AS key, '' AS piece,
                  CAST(count(*) AS BIGINT) AS n1,
                  CAST(sum(COALESCE(id, bid)) AS BIGINT) AS n2,
                  CAST(sum(pos * COALESCE(id, bid)) AS BIGINT) AS n3,
                  CAST(0.0 AS DOUBLE) AS f1
                FROM d4 LEFT JOIN vocabf USING (piece) GROUP BY doc_id),
    piecerows AS (SELECT 'piece' AS kind, id AS key, piece, cnt AS n1,
                    CAST(0 AS BIGINT) AS n2, CAST(0 AS BIGINT) AS n3, lp AS f1
                  FROM vocabf)
    SELECT * FROM (SELECT * FROM piecerows UNION ALL SELECT * FROM docrows)
    ORDER BY kind, key"""
    sb.toString
  }

  val q125: String = unigramOracle(vocabSize = 48, maxPieceLen = 4,
    minCount = 2, seedCap = 48, rounds = 2,
    maxLen = graft.operators.Unigram.MaxWordLen)

  // q121: brute-force all-pairs word-set Jaccard — the exactness oracle for
  // the prefix-filtered similarity join, on the doc_id % 10 sample (the
  // q17 convention; see the query's scaladoc). Tokenization mirrors
  // TextOps.normalized + whitespace split; empty token sets drop out.
  val q121 = """
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS nt
      FROM documents WHERE doc_id % 10 = 0),
    t AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(nt, ' +'))) AS tok
      FROM norm WHERE length(nt) > 0),
    sizes AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id),
    o AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS ov
          FROM t a JOIN t b USING (tok)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    p AS (SELECT ia AS id_a, ib AS id_b,
                 round(ov::DOUBLE / (sa.n + sb.n - ov)::DOUBLE, 6) AS jaccard
          FROM o JOIN sizes sa ON sa.doc_id = o.ia
                 JOIN sizes sb ON sb.doc_id = o.ib)
    SELECT id_a, id_b, jaccard FROM p
    WHERE jaccard >= 0.8
    ORDER BY id_a, id_b"""

  // q127: q121's exact pair set → recursive min-label components → the q76
  // uniform/cumulative-cut split arithmetic keyed on cluster_id ('leaksafe'
  // salt). Pairs body reuses q121 verbatim (same sample, same threshold).
  val q127: String = {
    val pairsBody = q121.trim.stripSuffix("ORDER BY id_a, id_b").trim
    s"""
    WITH RECURSIVE pr AS ($pairsBody),
    ids AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pr
              UNION ALL SELECT id_b, id_a FROM pr),
    lbl(id, label) AS (
        SELECT doc_id, doc_id FROM ids
      UNION
        SELECT e.src, l.label FROM edges e JOIN lbl l ON l.id = e.dst
    ),
    cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM lbl GROUP BY id),
    u AS (
      SELECT doc_id, cluster_id, list_reduce(list_prepend(0.0,
          list_transform(generate_series(1, 13),
            k -> CAST(strpos('0123456789abcdef',
                   substr(substr(md5(concat_ws('|', cluster_id, 'leaksafe')), 1, 13), k, 1)) - 1 AS DOUBLE)
                 * pow(16.0, 13 - k))),
        (a, x) -> a + x) / 4503599627370496.0 AS u
      FROM cl)
    SELECT doc_id, cluster_id,
           CASE WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
                WHEN u < CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE) THEN 'val'
                ELSE 'test' END AS split
    FROM u ORDER BY doc_id"""
  }

  // q128: exact triangle counting over the co-purchase part graph — the
  // full derivation replayed: canonical distinct edges, degrees,
  // (deg, id)-orientation, the ordered wedge join, the closing-edge join,
  // per-node triangle counts, and the 6-dp fenced clustering coefficient
  // with the identical left-assoc arithmetic.
  val q128 = """
    WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
    e0 AS (SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
           FROM li x JOIN li y ON x.ok = y.ok AND x.l_partkey < y.l_partkey),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
            (SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0)
            GROUP BY node),
    eo AS (SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src,
                  CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst,
                  greatest(du, dv) AS dd
           FROM (SELECT e0.u, e0.v, a.deg AS du, b.deg AS dv
                 FROM e0 JOIN deg a ON a.node = e0.u
                         JOIN deg b ON b.node = e0.v)),
    w AS (SELECT e1.src AS src, e1.dst AS d1, e2.dst AS d2
          FROM eo e1 JOIN eo e2 ON e1.src = e2.src
          WHERE e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
    t AS (SELECT w.src, w.d1, w.d2
          FROM w JOIN eo ON eo.src = w.d1 AND eo.dst = w.d2),
    pn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM
           (SELECT src AS node FROM t UNION ALL SELECT d1 AS node FROM t
            UNION ALL SELECT d2 AS node FROM t) GROUP BY node)
    SELECT CAST(deg.node AS BIGINT) AS node, deg.deg AS deg,
           CAST(coalesce(pn.tri, 0) AS BIGINT) AS tri,
           CASE WHEN deg.deg < 2 THEN 0.0
                ELSE floor(2.0 * CAST(coalesce(pn.tri, 0) AS DOUBLE) /
                     (CAST(deg.deg AS DOUBLE) * CAST(deg.deg - 1 AS DOUBLE)) *
                     1e6 + 0.5) / 1e6 END AS coef
    FROM deg LEFT JOIN pn ON pn.node = deg.node
    ORDER BY node"""

  /** q130: WordPiece — trained AND applied inside one generated query
    * (the q103/q125 convention). Mirrors [[graft.operators.WordPiece]]
    * term for term: the `|sym|` wrap with `##` spliced at internal
    * boundaries, per-iteration pair counts + symbol counts + the
    * likelihood-score argmax (`cnt/(cl·cr)` — ONE IEEE product+quotient
    * of long-exact doubles, identical cross-engine, ties on (l, r)),
    * merge application via the same non-overlapping replace, the
    * alphabet∪merge-output piece inventory with alphabetical ids, and
    * the greedy longest-match walk unrolled to MaxWordLen steps × 16
    * candidate lengths. Every chain CTE is MATERIALIZED (the bpeOracle
    * lesson). chr(1) is the never-matching replace pattern when an
    * iteration exhausts the pair table. */
  def wordPieceOracle(nMerges: Int, maxLen: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
    WITH d0 AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS norm
                FROM documents),
    d1 AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(norm, '\\s+') AS toks
           FROM d0 WHERE length(norm) > 0),
    w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(toks) AS word FROM d1) GROUP BY word),
    s0 AS MATERIALIZED (SELECT word, freq,
           replace(regexp_replace(word, '(.)', '|\\1|', 'g'), '||', '||##') AS w
         FROM w0)"""
    for (i <- 1 to nMerges) {
      sb ++= s""",
    y$i AS (SELECT freq, str_split(substring(w, 2, length(w) - 2), '||') AS syms
            FROM s${i - 1}),
    p$i AS (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
            FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
                  FROM y$i WHERE len(syms) >= 2)
            GROUP BY 1, 2),
    u$i AS MATERIALIZED (SELECT sym AS s, CAST(sum(freq) AS BIGINT) AS c
            FROM (SELECT freq, unnest(syms) AS sym FROM y$i) GROUP BY 1),
    b$i AS MATERIALIZED (SELECT l, r, cnt, ul.c AS cl, ur.c AS cr
            FROM p$i JOIN u$i ul ON ul.s = p$i.l JOIN u$i ur ON ur.s = p$i.r
            ORDER BY CAST(cnt AS DOUBLE) / (CAST(ul.c AS DOUBLE) * CAST(ur.c AS DOUBLE)) DESC,
                     l, r
            LIMIT 1),
    s$i AS MATERIALIZED (SELECT word, freq,
              replace(w,
                coalesce((SELECT '|' || l || '||' || r || '|' FROM b$i), chr(1)),
                coalesce((SELECT '|' || l || substr(r, 3) || '|' FROM b$i), '')) AS w
            FROM s${i - 1})"""
    }
    sb ++= s""",
    alpha AS (SELECT DISTINCT sym AS piece FROM
        (SELECT unnest(str_split(substring(w, 2, length(w) - 2), '||')) AS sym
         FROM s0)),
    vw AS (SELECT DISTINCT piece FROM (SELECT piece FROM alpha
        ${(1 to nMerges).map(i =>
          s"UNION ALL SELECT l || substr(r, 3) AS piece FROM b$i").mkString(" ")})),
    vid AS MATERIALIZED (SELECT piece,
           CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT) AS id FROM vw),
    g0 AS (SELECT word, 0 AS pos, CAST([] AS VARCHAR[]) AS seg FROM w0)"""
    for (j <- 1 to maxLen) {
      sb ++= s""",
    g$j AS MATERIALIZED (
        SELECT word, pos, seg FROM (
          SELECT s.word, s.pos + gl.l AS pos, list_append(s.seg, v.piece) AS seg,
                 row_number() OVER (PARTITION BY s.word ORDER BY gl.l DESC) AS rn
          FROM g${j - 1} s
          CROSS JOIN (SELECT unnest(generate_series(1, $maxLen)) AS l) gl
          JOIN vid v ON v.piece =
            (CASE WHEN s.pos = 0 THEN '' ELSE '##' END) ||
            substr(s.word, s.pos + 1, gl.l)
          WHERE s.pos < length(s.word) AND s.pos + gl.l <= length(s.word)
        ) WHERE rn = 1
        UNION ALL
        SELECT word, pos, seg FROM g${j - 1} WHERE pos = length(word))"""
    }
    sb ++= s""",
    d2 AS (SELECT doc_id, i AS wpos, toks[i] AS word
           FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
                 FROM d1)),
    d3a AS MATERIALIZED (SELECT d2.doc_id, d2.wpos, d2.word, g.seg
            FROM d2 LEFT JOIN g$maxLen g USING (word)),"""
    // A word MaxMatch could not cover falls out of the g-chain (no
    // pos = length(word) row survives the walk); the operator encodes it
    // as its UTF-8 BYTES at ids |vid| + byte (byte fallback, zero-OOV),
    // so the oracle synthesizes those rows from the LEFT-join miss with
    // hex-digit arithmetic. Unreachable for q130's closed corpus, where
    // every initial symbol is in vid. (Scala comment, not SQL `--`:
    // oracle strings are whitespace-collapsed to one line.)
    sb ++= s"""
    d3 AS (SELECT doc_id, wpos, j, seg[j] AS piece, CAST(NULL AS BIGINT) AS bid
           FROM (SELECT doc_id, wpos, seg,
                   unnest(generate_series(1, len(seg))) AS j FROM d3a
                 WHERE seg IS NOT NULL)
           UNION ALL
           SELECT doc_id, wpos, k AS j, NULL AS piece,
             CAST((SELECT count(*) FROM vid)
             + (strpos('0123456789abcdef',
                  substr(lower(hex(encode(word))), 2 * k - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                  substr(lower(hex(encode(word))), 2 * k, 1)) - 1) AS BIGINT) AS bid
           FROM (SELECT doc_id, wpos, word,
                   unnest(generate_series(1, octet_length(encode(word)))) AS k
                 FROM d3a WHERE seg IS NULL)),
    d4 AS (SELECT doc_id, piece, bid,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, j) AS BIGINT) AS pos
           FROM d3),
    docrows AS (SELECT 'doc' AS kind, CAST(doc_id AS BIGINT) AS key,
                  '' AS lft, '' AS rgt,
                  CAST(count(*) AS BIGINT) AS n1,
                  CAST(sum(COALESCE(id, bid)) AS BIGINT) AS n2,
                  CAST(sum(pos * COALESCE(id, bid)) AS BIGINT) AS n3
                FROM d4 LEFT JOIN vid USING (piece) GROUP BY doc_id),
    piecerows AS (SELECT 'piece' AS kind, id AS key, piece AS lft, '' AS rgt,
                    CAST(0 AS BIGINT) AS n1, CAST(0 AS BIGINT) AS n2,
                    CAST(0 AS BIGINT) AS n3
                  FROM vid),
    mergerows AS (${(1 to nMerges).map(i =>
        s"""SELECT 'merge' AS kind, CAST($i AS BIGINT) AS key, l AS lft,
            r AS rgt, cnt AS n1, cl AS n2, cr AS n3 FROM b$i""")
      .mkString(" UNION ALL ")})
    SELECT * FROM (SELECT * FROM mergerows UNION ALL SELECT * FROM piecerows
                   UNION ALL SELECT * FROM docrows)
    ORDER BY kind, key"""
    sb.toString
  }

  val q130: String = wordPieceOracle(nMerges = 30,
    maxLen = graft.operators.WordPiece.MaxWordLen)

  // q131: brute-force all-pairs levenshtein ≤ 1 over customer names — the
  // exactness oracle for the deletion-key-blocked fuzzy join (the q121
  // brute-force convention: completeness is the claim, so the oracle must
  // not share the blocking).
  val q131 = """
    WITH w AS (SELECT DISTINCT c_name AS word FROM customer)
    SELECT a.word AS word_a, b.word AS word_b
    FROM w a JOIN w b ON a.word < b.word
    WHERE levenshtein(a.word, b.word) <= 1
    ORDER BY word_a, word_b"""

  /** q133: k-core peeling, unrolled to the Spark side's 24-round guard
    * (converged rounds are no-ops): per round, degrees over the surviving
    * edges, the ≥ k node set, and the doubly-semi-joined edge filter. */
  def kCoreOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """
    WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
          FROM li x JOIN li y ON x.ok = y.ok AND x.l_partkey < y.l_partkey)"""
    for (r <- 1 to rounds) {
      sb ++= s""",
    d$r AS (SELECT node, count(*) AS deg FROM
            (SELECT u AS node FROM e${r - 1} UNION ALL SELECT v AS node FROM e${r - 1})
            GROUP BY node),
    k$r AS (SELECT node FROM d$r WHERE deg >= $k),
    e$r AS MATERIALIZED (SELECT u, v FROM e${r - 1}
            WHERE u IN (SELECT node FROM k$r) AND v IN (SELECT node FROM k$r))"""
    }
    sb ++= s"""
    SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS deg FROM
    (SELECT u AS node FROM e$rounds UNION ALL SELECT v AS node FROM e$rounds)
    GROUP BY node ORDER BY node"""
    sb.toString
  }

  val q133: String = kCoreOracle(k = 65, rounds = 24)

  // q134: PIVOT as filtered counts — count(*) FILTER is 0 (not NULL) for
  // absent combos, matching the Spark side's coalesce.
  val q134 = """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events WHERE user_id % 10 = 0
    GROUP BY user_id ORDER BY user_id"""

  // q135: CUBE with per-dimension grouping flags (q01's rounding
  // conventions; flags instead of grouping_id — bit order is engine-local).
  val q135 = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           count(*) AS count_order,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""

  // q132: SCD2 intervals — the second clamp, the (t, attr) total order,
  // the consecutive-equal collapse, and the lead/row_number interval
  // windows, replayed term for term.
  val q132 = """
    WITH e AS (SELECT user_id AS key, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                      CAST(event_type AS VARCHAR) AS attr
               FROM events WHERE user_id % 10 = 0),
    c AS (SELECT key, t, attr,
                 lag(attr) OVER (PARTITION BY key ORDER BY t, attr) AS prev
          FROM e),
    f AS (SELECT key, t, attr FROM c WHERE prev IS NULL OR prev <> attr)
    SELECT key AS user_id, attr, t AS valid_from,
           lead(t) OVER (PARTITION BY key ORDER BY t, attr) AS valid_to,
           CAST(row_number() OVER (PARTITION BY key ORDER BY t, attr) AS BIGINT) AS version
    FROM f ORDER BY user_id, version"""

  // q129: KMV theta-sketch set operations, replayed EXACTLY (KMV is
  // deterministic md5 order statistics — no tolerance gate needed): the
  // per-batch k-min sketches of both corpus snapshots, side A's fold
  // (k-min of the batch union — the compacted layout the Spark side
  // serves), the union k-min sample with membership flags, the
  // (k−1)/u_(k) estimator, the ρ-scaled intersection, the 6-dp fences,
  // and the exact anchors, all from the same scan.
  val q129: String = {
    val k = 512
    val h = md5Int52("concat_ws('|', word, 'kmv')")
    def batchA(i: Int) =
      s"""(SELECT h FROM (SELECT DISTINCT $h AS h FROM w
           WHERE side = 0 AND (doc_id // 2) % 3 = $i) ORDER BY h LIMIT $k)"""
    def batchB(i: Int) =
      s"""(SELECT h FROM (SELECT DISTINCT $h AS h FROM w
           WHERE side = 1 AND ((doc_id - 1) // 2) % 2 = $i) ORDER BY h LIMIT $k)"""
    s"""
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
               FROM documents),
    w AS (SELECT doc_id, doc_id % 2 AS side, unnest(toks) AS word
          FROM t WHERE len(toks) > 0),
    sa AS MATERIALIZED (SELECT h FROM (
          SELECT DISTINCT h FROM (${batchA(0)} UNION ALL ${batchA(1)}
                                  UNION ALL ${batchA(2)}))
          ORDER BY h LIMIT $k),
    sb AS MATERIALIZED (SELECT DISTINCT h FROM (${batchB(0)} UNION ALL ${batchB(1)})),
    ea AS (SELECT count(*) AS kept_a, max(h) AS hk FROM
           (SELECT h FROM sa ORDER BY h LIMIT $k)),
    eb AS (SELECT count(*) AS kept_b, max(h) AS hk FROM
           (SELECT h FROM (SELECT DISTINCT h FROM sb) ORDER BY h LIMIT $k)),
    uk AS (SELECT h FROM (SELECT DISTINCT h FROM
           (SELECT h FROM sa UNION ALL SELECT h FROM sb)) ORDER BY h LIMIT $k),
    fl AS (SELECT count(*) AS n_kept, max(uk.h) AS hk,
                  sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                      THEN 1 ELSE 0 END) AS n_both
           FROM uk LEFT JOIN sa a ON a.h = uk.h LEFT JOIN sb b ON b.h = uk.h),
    ov AS (SELECT CAST(n_kept AS BIGINT) AS n_kept,
                  CAST(n_both AS BIGINT) AS n_both,
                  floor((CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
                         ELSE CAST(${k - 1} AS DOUBLE) * 4503599627370496.0 /
                              CAST(hk AS DOUBLE) END) * 1e6 + 0.5) / 1e6 AS union_est,
                  floor((CAST(n_both AS DOUBLE) / CAST(n_kept AS DOUBLE)) *
                        (CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
                         ELSE CAST(${k - 1} AS DOUBLE) * 4503599627370496.0 /
                              CAST(hk AS DOUBLE) END) * 1e6 + 0.5) / 1e6 AS inter_est,
                  floor((CAST(n_both AS DOUBLE) / CAST(n_kept AS DOUBLE))
                        * 1e6 + 0.5) / 1e6 AS jaccard
           FROM fl),
    ca AS (SELECT CAST(kept_a AS BIGINT) AS kept_a,
                  floor((CASE WHEN kept_a < $k THEN CAST(kept_a AS DOUBLE)
                         ELSE CAST(${k - 1} AS DOUBLE) * 4503599627370496.0 /
                              CAST(hk AS DOUBLE) END) * 1e6 + 0.5) / 1e6 AS est_a
           FROM ea),
    cb AS (SELECT CAST(kept_b AS BIGINT) AS kept_b,
                  floor((CASE WHEN kept_b < $k THEN CAST(kept_b AS DOUBLE)
                         ELSE CAST(${k - 1} AS DOUBLE) * 4503599627370496.0 /
                              CAST(hk AS DOUBLE) END) * 1e6 + 0.5) / 1e6 AS est_b
           FROM eb),
    sides AS (SELECT word, max(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS in_a,
                     max(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_b
              FROM w GROUP BY word),
    ex AS (SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
                  CAST(sum(in_b) AS BIGINT) AS exact_b,
                  CAST(count(*) AS BIGINT) AS exact_union,
                  CAST(sum(in_a * in_b) AS BIGINT) AS exact_inter
           FROM sides)
    SELECT * FROM ca, cb, ov, ex"""
  }

  // Temperature mixture (q113): share/alpha/weight arithmetic + the q62
  // per-doc md5-uniform epoch draws, replayed end-to-end.
  val q113 = """
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    nn AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS nn FROM c),
    pp AS (SELECT source, n_docs, CAST(n_docs AS DOUBLE) / nn.nn AS p,
                  pow(CAST(n_docs AS DOUBLE) / nn.nn, 0.5) AS pa
           FROM c, nn),
    z AS (SELECT sum(pa) AS za FROM pp),
    w AS (SELECT source, n_docs, round(p, 9) AS share_before,
                 round(pa / za, 9) AS share_after,
                 round(pa / za * 10000.0 / CAST(n_docs AS DOUBLE), 9) AS weight
          FROM pp, z),
    dd AS (SELECT d.doc_id, d.source, w.weight,
                  substr(md5(concat_ws('|', d.doc_id, 'temp')), 1, 13) AS hx
           FROM documents d JOIN w USING (source)),
    u AS (SELECT *, list_reduce(list_prepend(0.0,
              list_transform(generate_series(1, 13),
                k -> CAST(strpos('0123456789abcdef', substr(hx, k, 1)) - 1 AS DOUBLE)
                     * pow(16.0, 13 - k))),
            (a, x) -> a + x) / 4503599627370496.0 AS u
          FROM dd),
    e AS (SELECT source,
                 sum(CAST(floor(weight) AS BIGINT) +
                     CASE WHEN u < weight - floor(weight) THEN 1 ELSE 0 END) AS n_sampled
          FROM u GROUP BY source)
    SELECT w.source, w.n_docs, w.share_before, w.share_after, w.weight,
           CAST(coalesce(e.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM w LEFT JOIN e USING (source) ORDER BY w.source"""

  // MMR replay (q114): shortlist, pairwise cosines, and every greedy
  // selection step unrolled — penalty term is max sim to the selected-so-
  // far set, ties break to the smaller doc_id via the ORDER BY.
  private def mmrStep(i: Int): String = s"""
    ms$i AS (SELECT c.doc_id, c.rel, max(sm.sim) AS ms
             FROM mc c JOIN sm ON sm.ia = c.doc_id
             JOIN selu${i - 1} u ON sm.ib = u.doc_id
             WHERE c.doc_id NOT IN (SELECT doc_id FROM selu${i - 1})
             GROUP BY c.doc_id, c.rel),
    sel$i AS (SELECT doc_id, 0.7 * rel - (1.0 - 0.7) * ms AS score FROM ms$i
              ORDER BY 0.7 * rel - (1.0 - 0.7) * ms DESC, doc_id LIMIT 1),
    selu$i AS (SELECT * FROM selu${i - 1}
               UNION ALL SELECT doc_id, $i AS rk, score FROM sel$i)"""

  val q114: String = s"""
    WITH mr AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    mc AS (SELECT e.vec_id AS doc_id,
             round(${cosineD("e.embedding", "mr.embedding")}, 9) AS rel,
             e.embedding AS v
           FROM embeddings e, mr WHERE e.vec_id > 0
           ORDER BY rel DESC, doc_id LIMIT 12),
    sm AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
             round(${cosineD("a.v", "b.v")}, 9) AS sim
           FROM mc a, mc b),
    sel1 AS (SELECT doc_id, 0.7 * rel - (1.0 - 0.7) * 0.0 AS score FROM mc
             ORDER BY 0.7 * rel - (1.0 - 0.7) * 0.0 DESC, doc_id LIMIT 1),
    selu1 AS (SELECT doc_id, 1 AS rk, score FROM sel1),
    ${mmrStep(2)},
    ${mmrStep(3)},
    ${mmrStep(4)},
    ${mmrStep(5)},
    ${mmrStep(6)}
    SELECT CAST(rk AS BIGINT) AS mmr_rank, doc_id, round(score, 6) AS mmr_score
    FROM selu6 ORDER BY rk"""

  // q148: the bottom-k rank sketch, FULL replay — per-row 52-bit md5
  // uniforms over the (l_orderkey:l_linenumber) row key, the (h, v)
  // bottom-4096 cut, the ceil(q·m) empirical-quantile pick, the exact
  // quantiles, and the corpus rank fraction of every estimate with the
  // 4.5% DKW gate. The direct build here equaling the Spark side's
  // merged-and-folded per-batch builds IS the merge proof (the q115
  // argument: bottom-k of a union = bottom-k of concatenated bottom-ks).
  val q148: String = {
    val k = 4096
    val qList = "[0.1, 0.25, 0.5, 0.75, 0.9, 0.99]"
    val h = md5Int52("concat_ws('|', concat_ws(':', l_orderkey, " +
      "l_linenumber, l_partkey, l_suppkey), 'rank')")
    s"""
    WITH src AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
                        $h AS h
                 FROM lineitem),
    samp AS MATERIALIZED (SELECT h, v FROM src ORDER BY h, v LIMIT $k),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM samp),
    ord AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM samp),
    qq AS (SELECT unnest($qList) AS q),
    est AS (SELECT q, o.v AS estimate
            FROM qq CROSS JOIN mm JOIN ord o
              ON o.rk = greatest(CAST(ceil(q * CAST(mm.m AS DOUBLE)) AS BIGINT), 1)),
    rf AS (SELECT e.q, e.estimate,
                  floor(CAST(sum(CASE WHEN s.v <= e.estimate THEN 1 ELSE 0 END)
                             AS DOUBLE) / CAST(count(*) AS DOUBLE)
                        * 1e6 + 0.5) / 1e6 AS rank_frac
           FROM est e CROSS JOIN src s GROUP BY e.q, e.estimate),
    ex AS (SELECT unnest($qList) AS q, round(unnest(l), 6) AS exact_q
           FROM (SELECT quantile_cont(v, $qList) AS l FROM src))
    SELECT r.q, r.estimate, x.exact_q, r.rank_frac,
           CAST(CASE WHEN abs(r.rank_frac - r.q) <= 0.045 THEN 1 ELSE 0 END
                AS BIGINT) AS dkw_ok
    FROM rf r JOIN ex x ON x.q = r.q ORDER BY r.q"""
  }

  // q150: the JL projection, FULL replay — the md5 Rademacher sign matrix
  // (+1 iff the first hex digit of md5('i:j|jl') has its top bit set),
  // every coordinate's left fold over the zipped (value, sign) list, the
  // norm-ratio witness folds, and the exact-integer distortion gate. The
  // 16 coordinates are hash-compared RAW (identical IEEE association both
  // sides — no fence); only the display ratio is fenced.
  val q150: String = {
    val dIn = 64; val dOut = 16
    val pivot = (1 to dOut).map(j =>
      s"max(CASE WHEN j = $j THEN p END) AS p${"%02d".format(j)}")
      .mkString(", ")
    val plist = (1 to dOut).map(j => s"p${"%02d".format(j)}").mkString(", ")
    s"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    sg AS (SELECT j, list_transform(generate_series(1, $dIn),
             i -> CASE WHEN strpos('89abcdef',
                    substr(md5(CAST(i AS VARCHAR) || ':' ||
                               CAST(j AS VARCHAR) || '|jl'), 1, 1)) > 0
                  THEN 1.0 ELSE -1.0 END) AS sl
           FROM (SELECT unnest(generate_series(1, $dOut)) AS j)),
    pj AS (SELECT vec_id, j,
             list_reduce(list_prepend(0.0, list_transform(
               generate_series(1, $dIn), i -> emb[i] * sl[i])),
               (a, x) -> a + x) / sqrt(${dOut}.0) AS p
           FROM e CROSS JOIN sg),
    w AS (SELECT vec_id, $pivot FROM pj GROUP BY vec_id),
    en AS (SELECT vec_id, list_reduce(list_prepend(0.0,
             list_transform(emb, x -> x * x)), (a, x) -> a + x) AS s2
           FROM e),
    rt AS (SELECT w.vec_id, $plist,
             CASE WHEN en.s2 > 0.0 THEN
               list_reduce(list_prepend(0.0, list_transform([$plist],
                 x -> x * x)), (a, x) -> a + x) / en.s2 END AS ratio
           FROM w JOIN en ON en.vec_id = w.vec_id),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN ratio BETWEEN 0.4 AND 2.5
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
          FROM rt)
    SELECT r.vec_id, $plist,
           floor(r.ratio * 1e6 + 0.5) / 1e6 AS norm_ratio, g.n, g.n_ok,
           CAST(CASE WHEN g.n_ok * 100 >= g.n * 95 THEN 1 ELSE 0 END
                AS BIGINT) AS gate_ok
    FROM rt r CROSS JOIN g ORDER BY r.vec_id"""
  }

  // q151: the group-wise rank sketch, FULL replay — per-group (h, v)
  // bottom-1024 cut (row_number over the same order), per-group ceil(q·m)
  // picks, exact per-group quantile anchors, corpus rank fractions, and
  // the 9% DKW gate. The Spark side's bounded aggregator kept-multiset
  // equals this ORDER BY h, v LIMIT k per group by construction.
  val q151: String = {
    val k = 1024
    val qList = "[0.25, 0.5, 0.9]"
    val h = md5Int52("concat_ws('|', concat_ws(':', l_orderkey, " +
      "l_linenumber, l_partkey, l_suppkey), 'rank')")
    s"""
    WITH src AS (SELECT l_returnflag AS flag,
                        CAST(l_extendedprice AS DOUBLE) AS v,
                        $h AS hh
                 FROM lineitem),
    rk AS (SELECT flag, v,
             row_number() OVER (PARTITION BY flag ORDER BY hh, v) AS r
           FROM src),
    samp AS MATERIALIZED (SELECT flag, v FROM rk WHERE r <= $k),
    mm AS (SELECT flag, CAST(count(*) AS BIGINT) AS m FROM samp GROUP BY flag),
    ord AS (SELECT flag, v,
              row_number() OVER (PARTITION BY flag ORDER BY v) AS rk2
            FROM samp),
    qq AS (SELECT unnest($qList) AS q),
    est AS (SELECT mm.flag, qq.q, o.v AS estimate, mm.m
            FROM mm CROSS JOIN qq JOIN ord o ON o.flag = mm.flag
              AND o.rk2 = greatest(CAST(ceil(qq.q * CAST(mm.m AS DOUBLE))
                                        AS BIGINT), 1)),
    rf AS (SELECT e.flag, e.q, e.estimate, e.m,
              floor(CAST(sum(CASE WHEN s.v <= e.estimate THEN 1 ELSE 0 END)
                         AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    * 1e6 + 0.5) / 1e6 AS rank_frac
           FROM est e JOIN src s ON s.flag = e.flag
           GROUP BY e.flag, e.q, e.estimate, e.m),
    ex AS (SELECT flag, unnest($qList) AS q, round(unnest(l), 6) AS exact_q
           FROM (SELECT flag, quantile_cont(v, $qList) AS l
                 FROM src GROUP BY flag))
    SELECT r.flag AS l_returnflag, r.q, r.estimate, x.exact_q, r.rank_frac,
           r.m,
           CAST(CASE WHEN abs(r.rank_frac - r.q) <= 0.09 THEN 1 ELSE 0 END
                AS BIGINT) AS dkw_ok
    FROM rf r JOIN ex x ON x.flag = r.flag AND x.q = r.q
    ORDER BY r.flag, r.q"""
  }

  // Count-Min replay (q115): the 52-bit md5 integer (the q26 fold,
  // undivided) mod width gives every bucket; cells are count-sums so the
  // whole-corpus build here equals the Spark side's merged per-batch
  // builds exactly — the equality IS the merge proof.
  private def md5Int52(key: String) =
    s"""CAST(list_reduce(list_prepend(0.0,
        list_transform(generate_series(1, 13),
          kk -> CAST(strpos('0123456789abcdef',
                     substr(substr(md5($key), 1, 13), kk, 1)) - 1 AS DOUBLE)
                * pow(16.0, 13 - kk))),
      (a, x) -> a + x) AS BIGINT)"""

  val q115: String = s"""
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
               FROM documents),
    tok AS (SELECT unnest(toks) AS k FROM t WHERE len(toks) > 0),
    cells AS (SELECT r, ${md5Int52("concat_ws('|', k, 'cms' || r)")} % 1024 AS bucket,
                     count(*) AS cnt
              FROM tok, unnest([0, 1, 2, 3]) AS rr(r)
              GROUP BY 1, 2),
    pk AS (SELECT unnest(['join', 'hash', 'scan', 'zzz_absent_token']) AS key),
    probes AS (SELECT key, r,
                 ${md5Int52("concat_ws('|', key, 'cms' || r)")} % 1024 AS bucket
               FROM pk, unnest([0, 1, 2, 3]) AS rr(r)),
    est AS (SELECT p.key, min(coalesce(c.cnt, 0)) AS estimate
            FROM probes p LEFT JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
            GROUP BY p.key),
    truth AS (SELECT k AS key, count(*) AS n_true FROM tok
              WHERE k IN ('join', 'hash', 'scan', 'zzz_absent_token')
              GROUP BY k)
    SELECT e.key, CAST(e.estimate AS BIGINT) AS estimate,
           CAST(coalesce(t2.n_true, 0) AS BIGINT) AS n_true
    FROM est e LEFT JOIN truth t2 ON t2.key = e.key
    ORDER BY e.key"""

  // C4 line filter (q116): replay the deterministic multi-line derivation
  // (8-token chunks, terminal '.' on every 3rd line) and the keep rule
  // (terminal punctuation + >=3 words + no banned substring)
  // expression-for-expression, then hash the reassembled text.
  val q116 = """
    WITH t AS (SELECT doc_id,
                 CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents),
    ln AS (SELECT doc_id,
             CASE WHEN len(toks) = 0 THEN ''
                  ELSE array_to_string(
                    list_transform(range(CAST(ceil(len(toks) / 8.0) AS BIGINT)),
                      i -> array_to_string(toks[i*8+1 : i*8+8], ' ') ||
                           CASE WHEN i % 3 = 0 THEN '.' ELSE '' END),
                    chr(10)) END AS t2
           FROM t),
    sp AS (SELECT doc_id, string_split(t2, chr(10)) AS ls FROM ln),
    k AS (SELECT doc_id, len(ls) AS n_lines,
            list_filter(ls, l -> right(rtrim(l), 1) IN ('.', '!', '?', '"')
              AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
              AND NOT contains(lower(l), 'slow')) AS kept
          FROM sp)
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
    FROM k ORDER BY doc_id"""

  // Histogram-quantile sketch (q117): whole-corpus fixed-edge histogram ==
  // Spark's merged per-batch builds (count-sum merge); the interpolated
  // estimates AND the exact quantiles both replay.
  val q117 = """
    WITH cells AS (SELECT CAST(least(greatest(
                     floor((CAST(value AS DOUBLE) - 0.0) / 2.0), 0.0), 255.0)
                     AS BIGINT) AS bin, count(*) AS cnt
                   FROM events GROUP BY 1),
    cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM cells),
    nn AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM cells),
    qq AS (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q),
    tgt AS (SELECT q, q * nn.n AS t FROM qq, nn),
    pick AS (SELECT t.q, t.t, c.bin, c.cnt, c.cum,
               row_number() OVER (PARTITION BY t.q ORDER BY c.bin) AS rk
             FROM tgt t JOIN cum c ON CAST(c.cum AS DOUBLE) >= t.t),
    est AS (SELECT q, round(0.0 + (CAST(bin AS DOUBLE) +
              (t - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)) * 2.0, 6)
              AS estimate
            FROM pick WHERE rk = 1),
    ex AS (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q,
                  round(unnest(l), 6) AS exact_q
           FROM (SELECT quantile_cont(value, [0.1, 0.5, 0.9, 0.99]) AS l
                 FROM events))
    SELECT e.q, e.estimate, x.exact_q,
           CAST(CASE WHEN abs(e.estimate - x.exact_q) <= 2.0
                THEN 1 ELSE 0 END AS BIGINT) AS within_bin
    FROM est e JOIN ex x ON x.q = e.q ORDER BY e.q"""

  /** name → oracle SQL (single-line, driver JSON-escapes anyway). */
  val all: Map[String, String] = Map(
    "q01_pricing_summary" -> q01,
    "q02_error_metrics" -> q02,
    "q03_histogram" -> q03,
    "q04_trapz" -> q04,
    "q05_minmax_scale" -> q05,
    "q06_inv_density_weights" -> q06,
    "q07_middle_lookup" -> q07,
    "q08_topk" -> q08,
    "q09_pool_deletion" -> q09,
    "q10_dedup_groups" -> q10,
    "q11_token_stats" -> q11,
    "q12_quality" -> q12,
    "q13_lang_id" -> q13,
    "q14_fingerprints" -> q14,
    "q15_ngram_jaccard" -> q15,
    "q16_cosine_topk" -> q16,
    "q17_embedding_pairs" -> q17,
    "q18_json" -> q18,
    "q19_hourly" -> q19,
    "q20_revenue_by_nation" -> q20,
    "q21_profile_orders" -> q21,
    "q22_validate" -> q22,
    "q23_dup_keys" -> q23,
    "q24_window_sums" -> q24,
    "q25_kde" -> q25,
    "q26_weighted_sample" -> q26,
    "q27_sliding_windows" -> q27,
    "q28_minhash_pairs" -> q28,
    "q29_simhash_pairs" -> q29,
    "q30_ann_ivf" -> q30,
    "q31_ann_topk_agg" -> q31,
    "q32_grid_source" -> q32,
    "q33_lhs_strata" -> q33,
    "q34_pca_project" -> q34,
    "q35_asof_join" -> q35,
    "q36_sessionize" -> q36,
    "q37_cube" -> q37,
    "q38_ranking" -> q38,
    "q39_percentiles" -> q39,
    "q40_left_join" -> q40,
    "q41_multi_distinct" -> q41,
    "q42_stratified_sample" -> q42,
    "q43_contamination" -> q43,
    "q44_dedup_clusters" -> q44,
    "q45_quality_gate" -> q45,
    "q46_repetition" -> q46,
    "q47_range_join" -> q47,
    "q48_sketch_gates" -> q48,
    "q49_interp_join" -> q49,
    "q50_heavy_hitters" -> q50,
    "q51_robust_outliers" -> q51,
    "q52_wav_roundtrip" -> q52,
    "q53_pgm_roundtrip" -> q53,
    "q54_bdqa_trace" -> q54,
    "q55_png_roundtrip" -> q55,
    "q56_aiff_roundtrip" -> q56,
    "q57_ann_pq" -> q57,
    "q58_mp3_metadata" -> q58,
    "q59_mp4_metadata" -> q59,
    // same exact semantics as q43 through the bloom-prefiltered path: the
    // direct-replay oracle makes any bloom false negative a hash break
    "q60_bloom_decontaminate" -> q43,
    "q61_sequence_packing" -> q61bpe,
    "q62_mixture_sample" -> q62,
    "q63_zorder_cells" -> q63,
    "q64_ann_ivfpq" -> q64,
    "q65_incremental_dedup" -> q65,
    "q66_corpus_to_dataloader" -> q66,
    "q67_key_skew" -> q67,
    "q68_vocab_encode" -> q68,
    "q69_compaction" -> q69,
    "q70_equidepth_bins" -> q70,
    "q71_group_limit" -> q71,
    "q72_pii_redaction" -> q72,
    "q73_calibration" -> q73,
    "q74_embedding_lsh_recall" -> q74,
    "q75_active_sampling_trace" -> q75,
    "q76_hash_split" -> q76,
    "q77_semantic_keepers" -> q77,
    "q78_doc_chunks" -> q78,
    "q79_contamination_fraction" -> q79,
    "q80_embedding_incremental_admit" -> q80,
    "q81_semdedup_keepers" -> q81,
    "q82_dsir_selection" -> q82,
    "q83_bigram_cross_entropy" -> q83,
    "q84_duplicated_spans" -> q84,
    "q85_bm25_topk" -> q85,
    "q86_segment_dedup" -> q86,
    "q87_quality_classifier" -> q87,
    "q88_token_budget_plan" -> q88bpe,
    "q89_bm25_indexed" -> q85,
    "q90_entropy_stats" -> q90,
    "q91_funnel" -> q91,
    "q92_retention" -> q92,
    "q93_image_phash_dedup" -> q93,
    "q94_anomaly_zscores" -> q94,
    "q95_audio_fingerprint_dedup" -> q95,
    "q96_funnel_windowed" -> q96,
    "q97_neyman_sample" -> q97,
    "q98_rendezvous_shards" -> q98,
    "q99_salted_join" -> q99,
    "q100_curation_audit" -> q100,
    "q101_chunk_bm25" -> q101,
    "q102_group_percent_rank" -> q102,
    "q103_bpe_tokenizer" -> q103,
    "q104_corpus_drift" -> q104,
    "q105_hybrid_rrf" -> q105,
    "q106_embedding_drift" -> q106,
    "q107_flac_roundtrip" -> q107,
    "q108_gmm_em" -> q108,
    "q109_ranking_metrics" -> q109,
    "q110_kn_trigram_ce" -> q110,
    "q111_hll_cardinality" -> q111,
    "q112_jsonl_source" -> q112,
    "q113_temperature_mix" -> q113,
    "q114_mmr_rerank" -> q114,
    "q115_cms_frequency" -> q115,
    "q116_c4_line_filter" -> q116,
    "q117_hist_quantiles" -> q117,
    "q118_ce_reweighting" -> q118,
    // q64's pinned-gate convention: the recall check runs Spark-side
    // against exact brute force; the oracle pins the expected verdict
    "q119_ann_incremental" -> q64,
    "q120_csv_source" -> q120,
    "q121_allpairs_jaccard" -> q121,
    "q122_orc_source" -> q122,
    "q123_pagerank" -> q123,
    "q124_gap_fill" -> q124,
    "q125_unigram_tokenizer" -> q125,
    "q126_ewma" -> q126,
    "q127_leakage_safe_split" -> q127,
    "q128_triangle_count" -> q128,
    "q129_kmv_overlap" -> q129,
    "q130_wordpiece_tokenizer" -> q130,
    "q131_fuzzy_name_pairs" -> q131,
    "q132_scd2_intervals" -> q132,
    "q133_kcore" -> q133,
    "q134_pivot" -> q134,
    "q135_cube" -> q135,
    // q136: the Avro round-trip gate is the ORC one — the format changes,
    // the parquet-original digests the read must reproduce do not.
    "q136_avro_source" -> q122,
    "q137_langid_trained" -> q137,
    "q138_bpe_byte_fallback" -> q138,
    "q139_mp3_fingerprint_dedup" -> q139,
    "q140_warc_source" -> q140,
    "q141_exact_substring_dedup" -> q141,
    "q142_triangles_doulion" -> q142,
    "q143_byte_level_bpe" -> q143,
    "q144_html_extract" -> q144,
    "q145_url_curation" -> q145,
    "q146_crawl_pipeline" -> q146,
    "q147_personalized_pagerank" -> q147,
    "q148_rank_sketch_quantiles" -> q148,
    "q149_perplexity_buckets" -> q149,
    "q150_jl_projection" -> q150,
    "q151_group_rank_quantiles" -> q151,
    // q152/q153: the q64 pinned-gate convention — recall vs exact brute
    // force runs Spark-side; the oracle pins the expected verdict row
    "q152_jl_ann" -> q64,
    "q153_jl_ivf_ann" -> q64,
    "q154_adts_metadata" -> q154,
    "q155_domain_cap" -> q155,
    "q156_robots_filter" -> q156,
    "q157_boilerplate_blocks" -> q157,
    "q158_wikixml_source" -> q158,
    "q159_blockword_scan" -> q159,
    "q160_crawl_pipeline_v2" -> q160,
    "q161_wikitext_clean" -> q161,
    "q162_wiki_corpus" -> q162,
    "q163_redirect_resolution" -> q163,
    "q164_link_graph" -> q164,
    "q165_crawl_graph_centrality" -> q165,
    "q166_anchor_corpus" -> q166,
    "q167_wiki_redirect_aliases" -> q167,
    "q168_jpeg_metadata" -> q168,
    "q169_domain_trustrank" -> q169,
    "q170_sitemap_seeds" -> q170,
    "q171_canonical_dedup" -> q171,
    "q172_crawl_pipeline_v3" -> q172,
    "q173_anchor_bm25f" -> q173,
    "q174_sitemap_coverage" -> q174,
    "q175_image_triage_route" -> q175,
    "q176_trust_gated_curation" -> q176,
    // q177 serves q165's graph from the incremental artifact — the fold
    // must be invisible, so the oracle IS q165's replay
    "q177_incremental_centrality" -> q165,
    "q178_crawl_frontier" -> q178,
    // q179 serves q173 from the postings index + anchor corpus — the
    // artifact path must be invisible, so the oracle IS q173's replay
    "q179_indexed_anchor_bm25f" -> q173,
    "q180_recrawl_wave" -> q180,
    "q181_incremental_anchor_corpus" -> q181,
    "q182_trust_frontier" -> q182,
    "q183_hits_domains" -> q183,
    "q184_centrality_blended_serving" -> q184,
    "q185_warm_rerank" -> q185
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
