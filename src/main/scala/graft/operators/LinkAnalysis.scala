package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality — weighted PageRank (Page, Brin, Motwani,
  * Winograd 1999, public method) as iterative DataFrame joins.
  *
  * Why it's here: crawl-corpus curation ranks HOSTS before it ranks
  * documents — Common Crawl publishes host/domain-level centrality
  * rankings for exactly this use, and a sampling weight derived from link
  * centrality is a standard quality prior for web-scale training data.
  * This is the iterative-graph sibling of [[Dedup.clusters]]' connected
  * components: per iteration one join (ranks → out-edges) and one
  * aggregation (incoming mass per destination), both hash-shuffles on node
  * keys.
  *
  * 100 TB shape: the edge list is pinned once with out-weight totals
  * attached (the join input never recomputes); each iteration shuffles
  * only (node, rank) pairs — 16 bytes of payload per node — against it.
  * On a real cluster, pre-partition edges by `src` and the per-iteration
  * rank frame co-partitions into a one-sided shuffle. Iterations pin via
  * the policy (lineage would otherwise double per round).
  *
  * Cross-engine determinism (the q108 GMM convention): every rank is
  * fenced to 9 dp with the pure-arithmetic `floor(x·1e9 + 0.5)/1e9`
  * (IEEE-deterministic, codegen-friendly — no BigDecimal round-trip), and
  * every composite expression is written in the same left-to-right
  * association the DuckDB oracle replays.
  */
object LinkAnalysis {

  private def fence9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)) / lit(1e9)

  /** Fixed-iteration weighted PageRank over directed `edges`
    * (src: string, dst: string, w: double, w > 0). Returns (node, rank)
    * for every node appearing as a src or dst. Dangling mass (nodes with
    * no out-edges) is redistributed uniformly each iteration.
    *
    * Pin cadence: each iteration references the previous rank frame once
    * (when no node dangles), so lineage grows linearly, not exponentially
    * — yet `pinEvery = 1` is the measured default anyway: deferring the
    * pins nests the per-iteration fence arithmetic into one deep codegen
    * expression and the whole-chain job ran ~1.5× SLOWER at sf0.1 (18.4 s
    * vs 11.9 s cold) than materializing each round. With dangling nodes
    * the rank frame is also consumed twice per iteration (the mass
    * aggregate), which forces the per-round pin regardless. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               pinEvery: Int = 1,
               policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(iters >= 1, s"iters >= 1: $iters")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    // Edge list with the source's total out-weight attached, pinned once —
    // this is the static join input every iteration reuses.
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
    val eo = policy.pin(e.join(outW, "src"))
    val nodesPinned = policy.pin(nodes)
    val n = nodesPinned.count().toDouble
    val base = lit(1.0 - damping) / lit(n)
    var ranks = policy.pin(
      nodesPinned.withColumn("rank", fence9(lit(1.0) / lit(n))))
    // the DANGLING NODE SET is static — decide once whether the
    // per-iteration mass action is needed at all; when it is not, adding
    // the 0.0/n term is the IEEE identity and is skipped (the oracle
    // replays the skipped form)
    val danglingNodes = policy.pin(
      nodesPinned.join(eo.select("src").distinct(),
        nodesPinned("node") === col("src"), "left_anti"))
    val hasDangling = danglingNodes.limit(1).count() > 0
    for (it <- 1 to iters) {
      // per-edge contribution, left-assoc (rank * w) / ow — the oracle
      // replays this exact association
      val contrib = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst"), (col("rank") * col("w") / col("ow")).as("c"))
      val incoming = contrib.groupBy("dst").agg(sum("c").as("inw"))
      // dangling nodes (no out-edges) leak their rank; redistribute evenly
      val inMass =
        if (!hasDangling) coalesce(col("inw"), lit(0.0))
        else {
          val dangling = ranks
            .join(danglingNodes.select(col("node").as("__dn")),
              ranks("node") === col("__dn"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
          coalesce(col("inw"), lit(0.0)) + lit(dangling) / lit(n)
        }
      val next =
        nodesPinned.join(incoming, nodesPinned("node") === incoming("dst"), "left")
          .select(col("node"),
            fence9(base + lit(damping) * inMass).as("rank"))
      ranks = if (hasDangling || it % pinEvery == 0) policy.pin(next) else next
    }
    ranks
  }

  /** The purchase graph: customer c ↔ supplier s, weighted by how many
    * lineitems connect them — both directions explicitly, so the walk
    * mixes and no node dangles. Node ids are LONGS (2·custkey for
    * customers, 2·suppkey+1 for suppliers): 8-byte keys halve the
    * per-iteration shuffle payload vs string ids. */
  def purchaseGraph(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val el = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).cast("double").as("w"))
      .select((col("o_custkey") * 2).as("cn"),
        (col("l_suppkey") * 2 + 1).as("sn"), col("w"))
    el.select(col("cn").as("src"), col("sn").as("dst"), col("w"))
      .unionByName(el.select(col("sn").as("src"), col("cn").as("dst"), col("w")))
  }
}
