package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — the doc → training-sample step when whole-document
  * packing isn't wanted: long documents split into context-window pieces
  * with overlap (pretraining with document boundaries respected, RAG
  * passage ingestion). Distinct from [[Packing]] (which concatenates MANY
  * docs into fixed windows); chunking slices ONE doc into ≤ maxLen pieces.
  */
object Chunking {

  /** Sliding chunks over a token array: chunk i covers tokens
    * [i·stride, i·stride + maxLen), starts 0, stride, 2·stride, …;
    * `nChunks = 1 + max(0, ceil((n − maxLen)/stride))`, so short docs
    * (0 < n ≤ maxLen) emit exactly one chunk, the last chunk may be
    * shorter than maxLen but never empty, and `stride < maxLen` gives
    * overlapping context windows. Empty-token docs emit nothing.
    *
    * Shape: one projection + one generate over the corpus scan — the
    * token array is computed once and chunks SLICE it (text never
    * re-splits per chunk); no shuffle, scan-speed at any corpus size.
    * Output: (doc_id, chunk_id, chunk) with chunk_id dense from 0. */
  def slidingChunks(df: DataFrame, id: Column, toks: Column,
                    maxLen: Int, stride: Int): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    require(stride > 0 && stride <= maxLen,
      "stride must be in [1, maxLen] (stride > maxLen would skip tokens)")
    val n = size(toks)
    val nChunks = when(n <= 0, lit(0)).otherwise(
      lit(1) + greatest(lit(0),
        ceil((n - lit(maxLen)).cast("double") / lit(stride)).cast("int")))
    df.select(id.cast("long").as("doc_id"), toks.as("__toks"),
        nChunks.as("__nc"))
      .filter(col("__nc") > 0)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxLen))
          .as("chunk"))
  }
}
