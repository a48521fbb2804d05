package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Vocabulary build + corpus encoding — the last step between packed text
  * and a dataloader: map each token to a dense integer id (out-of-vocab →
  * the UNK id = vocab size).
  *
  * Build = one token-count aggregate + a TakeOrdered of the top `size`
  * rows, with ids assigned by the range-partitioned
  * [[Ranking.globalRowNumber]] (deterministic `cnt desc, token asc`
  * order, no single-task window). Encode = posexplode + broadcast join
  * against the (tiny) vocabulary + one per-doc aggregate — the corpus
  * shuffles (doc_id, token-count) pairs, never text, and the shape is
  * exactly SQL-replayable (q68): alongside the plain counts, the
  * position-weighted sum `Σ (pos+1)·id` is an order-sensitive digest, so
  * any defect in tokenization order, vocab ranking, or the UNK rule
  * breaks the hash. */
object Vocab {

  /** (token, id) vocabulary of the `size` most frequent tokens;
    * ids 0..size-1 in (cnt desc, token asc) order. */
  def build(docs: DataFrame, text: Column, size: Int): DataFrame = {
    val counts = docs
      .select(explode(TextOps.tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("token")).limit(size)
    Ranking.globalRowNumber(counts, Seq(desc("cnt"), col("token")), out = "__rn")
      .select(col("token"), (col("__rn") - 1).cast("long").as("id"))
  }

  /** Per-doc encoding digests against `vocab` (UNK id = vocab size):
    * (doc_id, n_tok, n_unk, sum_ids, possum_ids) where
    * `possum_ids = Σ (pos+1)·id` over token positions. */
  def encode(docs: DataFrame, id: Column, text: Column,
             vocab: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs.select(id.cast("long").as("doc_id"),
        posexplode(TextOps.tokens(text)).as(Seq("pos", "token")))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(vocabSize.toLong)).as("tid"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("tid") === vocabSize.toLong, 1L).otherwise(0L)).as("n_unk"),
        sum(col("tid")).as("sum_ids"),
        sum((col("pos") + 1).cast("long") * col("tid")).as("possum_ids"))
  }
}
