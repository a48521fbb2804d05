package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing — laying documents into fixed-token-budget training
  * windows, the step between a curated corpus and a dataloader. Two
  * industry-standard shapes:
  *
  *  - [[concatAndCut]]: concatenate the whole corpus in a deterministic
  *    order and cut every `budget` tokens (documents may straddle window
  *    boundaries) — the classic GPT-style pretraining layout. Fully
  *    relational: a global running token sum (range-partitioned, no
  *    single-task window) plus integer arithmetic, so it is exactly
  *    SQL-replayable (the q61 oracle).
  *  - [[packGreedyPerShard]]: greedy no-split packing — a document never
  *    crosses a window boundary; a new window starts when the current one
  *    cannot fit the next document. The fold is inherently sequential, so
  *    it is parallelized the way real pipelines do: one independent
  *    packing stream per output shard (deterministic `doc_id % shards`
  *    assignment, doc_id order within a shard). Oversized docs (> budget)
  *    get a window of their own.
  */
object Packing {

  private def idiv(a: Column, b: Long): Column =
    floor(a.cast("double") / lit(b.toDouble)).cast("long")

  /** GPT-style concat-and-cut: per document, the first/last window index
    * it lands in and its offset inside the first window. Output columns:
    * original columns + `n_tok`, `first_bin`, `last_bin`, `bin_off`.
    * `order` must be a total order (include a unique id). */
  def concatAndCut(docs: DataFrame, order: Seq[Column], tok: Column,
                   budget: Long, partitions: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val cum = Ranking.globalCumSum(
      docs.withColumn("__tok", tok.cast("long")), order, col("__tok"),
      out = "__cum", partitions = partitions)
    val start = col("__cum") - col("__tok")
    cum
      .withColumn("n_tok", col("__tok"))
      .withColumn("first_bin", idiv(start, budget))
      .withColumn("last_bin",
        when(col("__tok") > 0, idiv(col("__cum") - 1, budget))
          .otherwise(idiv(start, budget)))
      .withColumn("bin_off", pmod(start, lit(budget)))
      .drop("__tok", "__cum")
  }

  /** Greedy no-split packing, one sequential stream per shard. Returns
    * (doc_id, n_tok, shard, bin) — `bin` is the window index within the
    * shard. Parallelism = shards (each shard's fold is one task);
    * determinism = (doc_id % shards) assignment + doc_id order. */
  def packGreedyPerShard(docs: DataFrame, id: Column, tok: Column,
                         budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val enc = Encoders.product[(Long, Long, Int, Long)]
    val prepped = docs
      .select(id.cast("long").as("doc_id"), tok.cast("long").as("n_tok"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards)).cast("int"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
    prepped.mapPartitions { it =>
      // a partition holds whole shards (hash partitioning on the shard id);
      // reset the fold whenever the shard changes
      var curShard = -1
      var bin = -1L
      var used = 0L
      it.map { r =>
        val d = r.getLong(0); val t = r.getLong(1); val sh = r.getInt(2)
        if (sh != curShard) { curShard = sh; bin = -1L; used = 0L }
        if (bin < 0 || used + t > budget) { bin += 1; used = 0L }
        used += t // an oversized doc occupies its own window
        (d, t, sh, bin)
      }
    }(enc).toDF("doc_id", "n_tok", "shard", "bin")
  }
}
