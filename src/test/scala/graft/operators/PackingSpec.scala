package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("concatAndCut matches a sequential fold on a closed-form fixture") {
    // budget 10; tokens 4,7,0,10,3 → starts 0,4,11,11,21
    val docs = Seq((0L, 4L), (1L, 7L), (2L, 0L), (3L, 10L), (4L, 3L))
      .toDF("doc_id", "t")
    val out = Packing.concatAndCut(docs, Seq(col("doc_id")), col("t"), 10L)
      .select("doc_id", "n_tok", "first_bin", "last_bin", "bin_off")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, 0L, 0L, 0L),   // [0,4)
      (1L, 7L, 0L, 1L, 4L),   // [4,11) straddles the bin-0/1 cut
      (2L, 0L, 1L, 1L, 1L),   // empty doc sits at offset 1 of bin 1
      (3L, 10L, 1L, 2L, 1L),  // [11,21)
      (4L, 3L, 2L, 2L, 1L)))  // [21,24)
  }

  test("concatAndCut across many range partitions equals the 1-partition answer") {
    val docs = (0L until 500L).map(i => (i, (i * 37 % 23))).toDF("doc_id", "t")
    def run(p: Int) = Packing
      .concatAndCut(docs, Seq(col("doc_id")), col("t"), 64L, partitions = p)
      .select("doc_id", "first_bin", "last_bin", "bin_off").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(run(16) == run(1), "partitioned cumsum diverged from sequential")
  }

  test("packGreedyPerShard: no window over budget, no doc split, deterministic") {
    val docs = (0L until 300L).map(i => (i, 1L + i * 13 % 40)).toDF("doc_id", "t")
    val packed = Packing.packGreedyPerShard(docs, col("doc_id"), col("t"),
      budget = 100L, shards = 8)
    val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getLong(3)))
    assert(rows.length == 300)
    // shard assignment is doc_id % shards
    assert(rows.forall { case (d, _, sh, _) => sh == (d % 8).toInt })
    // per (shard, bin): total ≤ budget (no oversized docs in this fixture)
    val byWin = rows.groupBy(r => (r._3, r._4)).map { case (_, g) => g.map(_._2).sum }
    assert(byWin.forall(_ <= 100L), "a window exceeded the token budget")
    // greedy: within a shard, bins are nondecreasing in doc order and a new
    // bin only opens when the previous one could not fit the doc
    rows.groupBy(_._3).foreach { case (_, g) =>
      val inOrder = g.sortBy(_._1)
      var used = 0L; var bin = -1L
      inOrder.foreach { case (d, t, _, b) =>
        if (bin < 0 || used + t > 100L) { assert(b == bin + 1, s"doc $d"); bin = b; used = 0L }
        else assert(b == bin, s"doc $d split or skipped a window")
        used += t
      }
    }
    // deterministic across runs
    val again = Packing.packGreedyPerShard(docs, col("doc_id"), col("t"),
      budget = 100L, shards = 8).collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rows.forall { case (d, _, _, b) => again(d) == b })
  }

  test("packGreedyPerShard gives an oversized doc its own window") {
    val docs = Seq((0L, 5L), (1L, 250L), (2L, 5L)).toDF("doc_id", "t")
    val rows = Packing.packGreedyPerShard(docs, col("doc_id"), col("t"),
        budget = 100L, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows(0L) == 0L && rows(1L) == 1L && rows(2L) == 2L)
  }
}
