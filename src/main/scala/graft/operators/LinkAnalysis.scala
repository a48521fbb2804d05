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
    * aggregate), which forces the per-round pin regardless.
    *
    * `init`: WARM START — an optional (node, rank) frame the power
    * iteration begins from instead of the uniform vector (power-method
    * restart from a prior fixed point: after an incremental edge-batch
    * append, yesterday's ranks are near today's fixed point, so far
    * fewer iterations recover converged-quality ranks — the standard
    * incremental-PageRank maintenance move; see Langville & Meyer,
    * "Updating PageRank" surveys, public method). Nodes ABSENT from
    * `init` (hosts first seen in the new batch) start at the uniform
    * fenced 1/n; init rows for nodes no longer in the graph are
    * ignored. The init vector is used as given — NOT renormalized —
    * because each damped iteration restores total mass toward 1 on its
    * own and renormalizing would break replay parity with the era that
    * produced it. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               pinEvery: Int = 1,
               policy: CheckpointPolicy = CheckpointPolicy.Local,
               init: Option[DataFrame] = None): DataFrame = {
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
    var ranks = policy.pin(init match {
      case None =>
        nodesPinned.withColumn("rank", fence9(lit(1.0) / lit(n)))
      case Some(prev) =>
        nodesPinned.join(
            prev.select(col("node").as("__in"),
              col("rank").cast("double").as("__ir")),
            nodesPinned("node") === col("__in"), "left")
          .select(col("node"),
            coalesce(col("__ir"), fence9(lit(1.0) / lit(n))).as("rank"))
    })
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
          val raw = ranks
            .join(danglingNodes.select(col("node").as("__dn")),
              ranks("node") === col("__dn"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
          // 9-dp fence on the cross-engine scalar (the PPR convention):
          // partial-agg merge order can differ from an oracle's
          // sequential sum by an ulp; fencing both sides pins it
          val dangling = math.floor(raw * 1e9 + 0.5) / 1e9
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

  /** Personalized PageRank (random walk with restart — Page et al. 1999
    * §6 "personalized" vector; Jeh & Widom 2003, public methods): the
    * restart mass lands on the `sources` node set instead of uniformly,
    * so ranks measure proximity TO THE SOURCES rather than global
    * centrality. The crawl-curation use: seed with a trusted host/domain
    * whitelist and the stationary mass becomes a "distance from trust"
    * quality prior per host (TrustRank, Gyöngyi et al. 2004 is exactly
    * this shape) — the personalized sibling of [[pageRank]]'s global
    * prior.
    *
    * Inputs: directed `edges(src, dst, w)` with w > 0, and `sources`
    * (one column, node ids castable to the edge key type); sources not
    * present in the graph still receive restart mass (they rank by it),
    * and the restart distribution is uniform over the DISTINCT source
    * set. Nodes unreachable from every source fence to exactly 0.0.
    * Dangling nodes redistribute their mass through the RESTART vector
    * (the standard PPR convention: a terminated walk restarts at a
    * source), not uniformly.
    *
    * Same 100 TB shape as [[pageRank]] — the static edge+out-weight frame
    * is pinned once, each iteration shuffles only (node, rank) — plus one
    * extra static column: the per-node restart mass `rst` rides the node
    * frame, so the iteration adds zero joins over the global variant.
    * Same 9-dp fence, same left-assoc arithmetic, oracle-replayable
    * iteration for iteration. */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame, iters: Int,
                           damping: Double = 0.85,
                           policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(iters >= 1, s"iters >= 1: $iters")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
    val src0 = sources.toDF("node").select(col("node")).distinct()
    val graphNodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
    // node universe = graph nodes ∪ sources (an off-graph source still
    // holds restart mass; dropping it would leak (1-d)/|S| every round)
    val nodes = graphNodes.unionByName(src0).distinct()
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
    val eo = policy.pin(e.join(outW, "src"))
    val nS = src0.count().toDouble
    require(nS >= 1.0, "personalizedPageRank needs a non-empty source set")
    // static per-node restart mass: 1/|S| on sources, 0 elsewhere — joined
    // ONCE into the pinned node frame, reused every iteration
    val nodesR = policy.pin(
      nodes.join(src0.withColumn("__s", lit(1)), Seq("node"), "left")
        .select(col("node"),
          when(col("__s").isNotNull, lit(1.0 / nS)).otherwise(lit(0.0)).as("rst")))
    var ranks = policy.pin(
      nodesR.select(col("node"), fence9(col("rst")).as("rank")))
    val danglingNodes = policy.pin(
      nodesR.join(eo.select("src").distinct(),
        nodesR("node") === col("src"), "left_anti").select("node"))
    val hasDangling = danglingNodes.limit(1).count() > 0
    for (it <- 1 to iters) {
      val contrib = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst"), (col("rank") * col("w") / col("ow")).as("c"))
      val incoming = contrib.groupBy("dst").agg(sum("c").as("inw"))
      // dangling mass restarts at the sources, scaled by each node's rst.
      // The scalar is a driver .head() on the PINNED rank frame — the
      // "one job per iteration" alternative (riding the aggregate in as
      // a broadcast 1-row crossJoin) measured 21.6 s vs 15.6 s at sf1
      // quiet: the BNLJ + in-plan broadcast subtree costs more than the
      // tiny synchronous job it saves. Measured, not assumed (the
      // pageRank pinEvery lesson).
      val inMass =
        if (!hasDangling) coalesce(col("inw"), lit(0.0))
        else {
          val raw = ranks
            .join(danglingNodes.select(col("node").as("__dn")),
              ranks("node") === col("__dn"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
          // 9-dp fence on the cross-engine scalar: Spark's partial-agg
          // merge order can differ from the oracle's sequential sum by an
          // ulp; fencing both sides (the oracle's dg CTEs mirror this
          // floor) pins the value instead of relying on ulp coincidence.
          val dangling = math.floor(raw * 1e9 + 0.5) / 1e9
          coalesce(col("inw"), lit(0.0)) + lit(dangling) * col("rst")
        }
      val next =
        nodesR.join(incoming, nodesR("node") === incoming("dst"), "left")
          .select(col("node"), col("rst"),
            fence9(lit(1.0 - damping) * col("rst") + lit(damping) * inMass)
              .as("rank"))
      ranks = policy.pin(next)
    }
    ranks.select("node", "rank")
  }

  /** HITS hubs & authorities (Kleinberg 1999, public method) over
    * directed weighted `edges(src, dst, w)` — the mutual-reinforcement
    * complement to [[pageRank]]'s walk centrality: a good HUB links to
    * good authorities, a good AUTHORITY is linked by good hubs. The
    * crawl-curation use: authority ranks the pages worth keeping, hub
    * ranks the directory/index pages whose ANCHOR TEXT is worth
    * harvesting (the [[LinkGraph.anchorCorpus]] quality prior).
    *
    * Fixed-iteration, L1-normalized (each half-step divides by the 9-dp
    * fenced total so scores form a distribution — any norm yields the
    * same ranking; L1 keeps the arithmetic oracle-replayable): per
    * round auth'(v) = Σ_{(u,v)} hub(u)·w then normalize, hub'(u) =
    * Σ_{(u,v)} auth(v)·w then normalize. Init: uniform 1/n hubs. Nodes
    * with no in-edges fence to auth 0.0, no out-edges to hub 0.0.
    * Output: (node, hub, auth) for every node appearing as src or dst.
    *
    * Same 100 TB shape as [[pageRank]]: the edge frame is pinned once,
    * each half-iteration shuffles only (node, score) pairs against it;
    * the norm scalar is a driver `.head()` on the pinned raw frame (the
    * personalizedPageRank-measured convention — cheaper than a
    * broadcast-crossJoin subtree). Same 9-dp fence, same left-assoc
    * score·w products, oracle-replayable iteration for iteration. */
  def hits(edges: DataFrame, iters: Int,
           policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(iters >= 1, s"iters >= 1: $iters")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
    val eP = policy.pin(e)
    val nodes = policy.pin(
      eP.select(col("src").as("node"))
        .unionByName(eP.select(col("dst").as("node"))).distinct())
    val n = nodes.count().toDouble
    def fencedTotal(raw: DataFrame): Double = {
      val t = raw.agg(coalesce(sum("raw"), lit(0.0))).head().getDouble(0)
      math.floor(t * 1e9 + 0.5) / 1e9
    }
    // one half-step: weighted mass onto `key`, L1-normalize over nodes.
    // An edgeless graph (total 0) degenerates to all-zero scores rather
    // than dividing by zero.
    def halfStep(scores: DataFrame, scoreCol: String, from: String,
                 onto: String, outCol: String): DataFrame = {
      val raw = policy.pin(
        eP.join(scores, eP(from) === scores("node"))
          .select(col(onto).as("__k"),
            (col(scoreCol) * col("w")).as("c"))
          .groupBy("__k").agg(sum("c").as("raw")))
      val total = fencedTotal(raw)
      val normed =
        if (total == 0.0) lit(0.0)
        else fence9(coalesce(col("raw"), lit(0.0)) / lit(total))
      nodes.join(raw, nodes("node") === raw("__k"), "left")
        .select(col("node"), normed.as(outCol))
    }
    var hub = policy.pin(nodes.select(col("node"),
      fence9(lit(1.0) / lit(n)).as("hub")))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = policy.pin(halfStep(hub, "hub", "src", "dst", "auth"))
      hub = policy.pin(halfStep(auth, "auth", "dst", "src", "hub"))
    }
    hub.join(auth.select(col("node").as("__n"), col("auth")),
        hub("node") === col("__n"))
      .select(col("node"), col("hub"), col("auth"))
  }

  /** Exact triangle counting + local clustering coefficients over an
    * undirected simple graph, via degree-ordered edge orientation
    * (Schank & Wagner 2005; Suri & Vassilvitskii 2011 — public methods).
    * The static-graph sibling of [[pageRank]]: PageRank ranks nodes by
    * walk centrality, this measures local community density — the
    * standard pair for link-graph curation priors.
    *
    * Input: `edges(a, b)` node pairs castable to long, either direction;
    * duplicates and self-loops are canonicalized away. Output: one row
    * per node with at least one incident edge —
    * `(node, deg, tri, coef)` where `tri` counts triangles through the
    * node and `coef = 2·tri / (deg·(deg−1))` (the local clustering
    * coefficient, 6-dp arithmetic fence; 0.0 when deg < 2).
    *
    * 100 TB shape: orienting every edge from its lower-(deg, id)
    * endpoint to the higher one bounds each node's OUT-degree by
    * O(√m), so the wedge self-join — the only expansion in the plan —
    * emits Σ C(outdeg, 2) = O(m^{3/2}) candidate rows (the sequential
    * optimum for triangle enumeration) instead of the Σ C(deg, 2) an
    * un-oriented join would: a single 10⁶-degree hub alone would emit
    * 5·10¹¹ wedges un-oriented. Every step is a hash shuffle on
    * node/pair keys (canonical-edge distinct, degree count, two joins,
    * wedge join, closing-edge join, final count) — no windows, no
    * driver state, no cartesian. */
  def triangles(edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("node"))
      .unionByName(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Orient low (deg, id) -> high (deg, id); carry the destination's rank
    // so the wedge join can order its two legs without re-joining degrees.
    // Deliberately NOT pinned although three branches consume it: measured
    // at sf0.1, a localCheckpoint here ran 2.4x SLOWER (13.7 s vs 5.8 s
    // warm) — exchange reuse already covers both wedge legs, AQE re-plans
    // the closing probe from runtime stats, and the pin trades those for
    // an eager materialization plus a codegen fence (the inverse of the
    // pageRank pinEvery finding: measure, don't assume).
    val e = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        greatest(col("du"), col("dv")).as("dd"))
    // A wedge (src; d1, d2) with rank(d1) < rank(d2) closes into a triangle
    // iff the ORIENTED edge (d1 -> d2) exists — both wedge legs out-rank
    // src, and orientation follows rank, so each triangle is found exactly
    // once, at its lowest-rank corner.
    val wedges = e.select(col("src"), col("dst").as("d1"), col("dd").as("r1"))
      .join(e.select(col("src"), col("dst").as("d2"), col("dd").as("r2")), Seq("src"))
      .filter(col("r1") < col("r2") ||
        (col("r1") === col("r2") && col("d1") < col("d2")))
    val tris = wedges.join(
      e.select(col("src").as("d1"), col("dst").as("d2")), Seq("d1", "d2"))
    val perNode = tris
      .select(explode(array(col("src"), col("d1"), col("d2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") < 2, lit(0.0)).otherwise(
          floor(lit(2.0) * coalesce(col("tri"), lit(0L)).cast("double") /
            (col("deg").cast("double") * (col("deg") - 1).cast("double")) *
            lit(1e6) + lit(0.5)) / lit(1e6)).as("coef"))
  }

  /** Doulion sampled triangle estimate (Tsourakakis, Kang, Miller &
    * Faloutsos, KDD 2009 — public method): keep each canonical edge
    * independently with probability `p`, count triangles EXACTLY on the
    * sparsified graph with [[triangles]]' degree-ordered machinery, and
    * scale by 1/p³ — an unbiased estimator of the true count (each
    * triangle survives with probability p³). The 100 TB answer to
    * [[triangles]]' O(m^{3/2}) wedge bound: at p the wedge mass shrinks
    * by ~p³ (candidate wedges p², closure p) for a p⁻³-variance trade —
    * Doulion's published accuracy envelope; the q142 spec gates the
    * relative error and the across-salts unbiasedness empirically.
    *
    * Sampling is DETERMINISTIC — the engine-portable md5 uniform
    * ([[graft.functions.TextOps.portableUniform52]]) over `"u:v|salt"` —
    * so runs are reproducible, re-executions of a failed stage keep the
    * same subgraph (a `rand()` sample would break retry idempotence),
    * and the DuckDB oracle replays the exact estimate. Vary `salt` for
    * independent estimates (averaging k salted runs divides the variance
    * by k at k·p³ of the exact cost).
    *
    * Output: ONE row `(total_edges, kept_edges, tri_sampled, tri_est)`
    * (6-dp arithmetic fence on the estimate). */
  def trianglesDoulion(edges: DataFrame, p: Double,
                       salt: String = "doulion"): DataFrame = {
    require(p > 0.0 && p <= 1.0, "keep probability in (0, 1]")
    val canon = edges.select(
        least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
    val u01 = graft.functions.TextOps.portableUniform52(
      concat_ws("|", concat_ws(":", col("u"), col("v")), lit(salt)))
    val flagged = canon.withColumn("keep", u01 < lit(p))
    val kept = flagged.filter(col("keep"))
      .select(col("u").as("a"), col("v").as("b"))
    val triSampled = triangles(kept)
      .agg((coalesce(sum("tri"), lit(0L)) / 3).cast("long").as("tri_sampled"))
    val edgeStats = flagged.agg(count(lit(1)).as("total_edges"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept_edges"))
    // both sides are single aggregate rows — a broadcast pairing, not a
    // data cartesian (the LangModel stats-frame convention)
    edgeStats.crossJoin(triSampled)
      .select(col("total_edges"), col("kept_edges"), col("tri_sampled"),
        (floor(col("tri_sampled").cast("double") / lit(p * p * p) * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("tri_est"))
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k
    * (Seidman 1983 — public method), by iterative peeling: drop nodes of
    * degree < k, recompute degrees over the surviving edges, repeat to
    * fixpoint. The density filter of graph curation — spam link farms and
    * genuinely dense communities survive, tendrils and satellites peel
    * away — and the third static-graph operator next to [[pageRank]]
    * (walk centrality) and [[triangles]] (local density).
    *
    * Input: `edges(a, b)` as in [[triangles]] (canonicalized the same
    * way). Output: the surviving nodes with their degree INSIDE the core
    * — `(node, deg)`; empty when no k-core exists.
    *
    * 100 TB shape: each round is one degree aggregate + one semi-join of
    * the edge list against the surviving node set (both hash shuffles on
    * node keys, edge payload 16 bytes); the edge frame is pinned per
    * round (the iterative-join convention — lineage would otherwise
    * nest). Rounds are data-dependent but bounded: each non-final round
    * removes ≥ 1 node, and in practice peeling converges in a few rounds
    * (the `maxRounds` guard fails loudly instead of looping — the q125
    * MaxWordLen convention, because the oracle unrolls exactly
    * `maxRounds` rounds). */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 24,
            policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val canon = edges.select(
        least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
    var e = policy.pin(canon)
    var n = e.count() // edge count drives the fixpoint check
    var rounds = 0
    var converged = n == 0L
    while (!converged) {
      require(rounds < maxRounds,
        s"k-core did not converge in $maxRounds rounds (the oracle's unroll)")
      val deg = e.select(col("u").as("node"))
        .unionByName(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      val next = policy.pin(
        e.join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
          .select("u", "v"))
      val m = next.count()
      converged = m == n || m == 0L
      e = next
      n = m
      rounds += 1
    }
    e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** The co-purchase part graph: an undirected edge between every pair of
    * distinct parts appearing in the same order ("frequently bought
    * together") — the self-join is per-order (≤ 7 lineitems in the TPC-H
    * shape), so pair fan-out is Σ C(items, 2) = output-sized, never
    * quadratic in the table. */
  def coPurchaseGraph(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey"))
    li.select(col("ok"), col("l_partkey").as("a"))
      .join(li.select(col("ok"), col("l_partkey").as("b")), Seq("ok"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
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
