package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin family (Bayardo, Ma, Srikant, "Scaling Up All Pairs
  * Similarity Search", WWW 2007; Xiao et al., PPJoin — public methods).
  *
  * The LSH paths ([[Dedup.minhashDedupPairs]], [[Dedup.ngramJaccardPairs]]'
  * length/first-char blocking) trade recall for speed: a pair can be missed
  * when it lands in no shared bucket. This operator is COMPLETE — every
  * pair with Jaccard ≥ t is emitted — while still avoiding the O(n²) cross
  * join, via the prefix-filter lemma: order all tokens by ascending
  * document frequency (rarest first, ties by token); a record x of size
  * |x| keeps a prefix of its first |x| − ⌈t·|x|⌉ + 1 tokens; then for any
  * pair with overlap ≥ max(⌈t·|x|⌉, ⌈t·|y|⌉) the rarest COMMON token must
  * sit inside BOTH prefixes (if it didn't, all common tokens would fit in
  * a suffix of size ⌈t·|x|⌉ − 1 < overlap). Candidate generation is thus an
  * equi-join of exploded prefixes on the token id — and because prefixes
  * are rarest-first, the join keys are exactly the tokens with the lowest
  * document frequency, keeping per-key fan-out small.
  *
  * 100 TB shape: one corpus scan builds distinct-token postings; document
  * frequency is a token-keyed count; the global rarity ranking is the
  * scale-safe [[Ranking.globalRowNumber]] (range partition + offsets — no
  * single-task sort); candidate generation shuffles only (token id, group
  * id, set size) triples; verification re-joins the two candidate sides to
  * their sorted id vectors and merge-intersects them in one codegen'd
  * expression ([[graft.functions.ArrayExprs.sortedIntersectSize]]).
  * Duplicate-heavy corpora (the LSH quadratic-cluster gotcha) are handled
  * by running the whole join over DISTINCT token SETS — identical documents
  * collapse into one group keyed by the sorted id vector, pairs are found
  * between groups, and doc pairs expand at the very end (intra-group pairs
  * are emitted directly at jaccard 1.0).
  */
object SimilarityJoin {

  /** All document pairs with word-set Jaccard ≥ `threshold`, exactly.
    *
    * Tokens are whitespace words of [[TextOps.normalized]] text (the
    * corpus-dedup normalization); documents with an empty token set have
    * undefined Jaccard and pair with nothing. Output: (id_a, id_b,
    * jaccard) with id_a < id_b, jaccard rounded to 6 dp (the q15
    * convention — identical arithmetic to the DuckDB replay).
    */
  def allPairsJaccard(df: DataFrame, id: Column, text: Column,
                      threshold: Double,
                      policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val toks = df
      .select(id.cast("long").as("doc_id"),
        explode(array_distinct(TextOps.tokens(TextOps.normalized(text)))).as("tok"))
    // Global rarity ranking: ascending document frequency, ties by token —
    // a total order, so every engine/partitioning assigns the same ids.
    val vocab = Ranking.globalRowNumber(
      toks.groupBy("tok").agg(count(lit(1)).as("df_cnt")),
      Seq(col("df_cnt"), col("tok")), out = "tid")
      .select("tok", "tid")
    // Sorted-ascending tid vector per doc = rarest-first prefix order AND
    // value-sorted input for the merge-intersect verifier, in one array.
    val vecs = toks.join(vocab, "tok")
      .groupBy("doc_id").agg(sort_array(collect_list(col("tid"))).as("v"))
    // Distinct token sets: group docs by the vector itself; gid = min doc id
    // (collision-free — each doc belongs to exactly one group).
    val groups = policy.pin(
      vecs.groupBy("v").agg(collect_list(col("doc_id")).as("ids"))
        .withColumn("gid", array_min(col("ids")))
        .withColumn("n", size(col("v"))))
    // Prefix explode WITHOUT the vector payload: candidate rows carry only
    // (ptok, gid, n) — the full vectors re-join after candidate dedup.
    val pre = groups.select(col("gid"), col("n"),
      explode(slice(col("v"), lit(1),
        (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int"))).as("ptok"))
    val cand = pre.select(col("ptok"), col("gid").as("gid_a"), col("n").as("n_a"))
      .join(pre.select(col("ptok"), col("gid").as("gid_b"), col("n").as("n_b")),
        Seq("ptok"))
      .filter(col("gid_a") < col("gid_b"))
      // length filter: J ≥ t ⇒ min(|x|,|y|) ≥ t·max(|x|,|y|)
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(threshold) * greatest(col("n_a"), col("n_b")).cast("double"))
      .dropDuplicates("gid_a", "gid_b")
      .select("gid_a", "gid_b")
    val verified = cand
      .join(groups.select(col("gid").as("gid_a"), col("v").as("va"), col("n").as("na")), Seq("gid_a"))
      .join(groups.select(col("gid").as("gid_b"), col("v").as("vb"), col("n").as("nb")), Seq("gid_b"))
      .withColumn("__inter",
        graft.functions.ArrayExprs.sortedIntersectSize(col("va"), col("vb")))
      .select(col("gid_a"), col("gid_b"),
        round(col("__inter").cast("double") /
          (col("na") + col("nb") - col("__inter")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val cross = verified
      .join(groups.select(col("gid").as("gid_a"), col("ids").as("ids_a")), Seq("gid_a"))
      .join(groups.select(col("gid").as("gid_b"), col("ids").as("ids_b")), Seq("gid_b"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("jaccard"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("jaccard"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("jaccard"))
    val intra = groups.filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("ia"), col("ids"))
      .select(col("ia"), explode(col("ids")).as("ib"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"), lit(1.0).as("jaccard"))
    cross.unionByName(intra).select("id_a", "id_b", "jaccard")
  }

  /** EXACT all-pairs edit-distance-1 self-join over distinct strings, via
    * deletion-neighborhood blocking (the SymSpell device — Garbe 2012;
    * Mor & Fraenkel 1982's deletion-variant dictionary — public methods):
    * the fuzzy-matching primitive behind typo-tolerant entity resolution
    * and spell-correction candidate tables.
    *
    * Completeness: if lev(a, b) ≤ 1 the two strings share a DELETION KEY
    * — a member of {x} ∪ {x minus one char}: equal strings share
    * themselves; an insertion's longer side deletes the inserted char to
    * reach the shorter; a substitution at position i gives both sides the
    * same string when position i is deleted. The key join is therefore a
    * complete candidate generator (it also admits some distance-2 pairs —
    * two different single-char deletions meeting in the middle — which
    * the exact `levenshtein` verification removes).
    *
    * 100 TB shape: candidates come from an equi-join on exploded deletion
    * keys over DISTINCT strings — (len+1) keys per string, per-key
    * fan-out bounded by how many strings collapse onto one deletion (a
    * vocabulary property, ~alphabet-sized for natural keys) — never an
    * all-pairs product; the verifier is one codegen `levenshtein` per
    * candidate. Output: (word_a, word_b) with word_a < word_b, exactly
    * the lev ≤ 1 pairs.
    */
  def editNeighborPairs(words: DataFrame, word: Column): DataFrame = {
    val w = words.select(word.cast("string").as("word"))
      .filter(col("word").isNotNull).distinct()
    val keyed = w.select(col("word"), explode(concat(
        array(col("word")),
        transform(sequence(lit(1), length(col("word"))), i =>
          concat(col("word").substr(lit(1), i - 1),
            col("word").substr(i + 1, length(col("word"))))))).as("key"))
      .distinct() // duplicate chars give duplicate deletion keys
    // verify BEFORE deduplicating: the codegen levenshtein is cheaper per
    // row than shuffling every multi-key candidate into the distinct —
    // only true pairs (× their key multiplicity, ≤ 3) reach the exchange
    keyed.select(col("key"), col("word").as("word_a"))
      .join(keyed.select(col("key"), col("word").as("word_b")), Seq("key"))
      .filter(col("word_a") < col("word_b") &&
        levenshtein(col("word_a"), col("word_b")) <= 1)
      .select("word_a", "word_b").distinct()
  }
}
