package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def fence9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("pageRank matches a hand-rolled reference on a small weighted graph") {
    // a -> b (2.0), a -> c (1.0), b -> c (1.0), c -> a (1.0)
    val edges = Seq(("a", "b", 2.0), ("a", "c", 1.0),
      ("b", "c", 1.0), ("c", "a", 1.0)).toDF("src", "dst", "w")
    val got = LinkAnalysis.pageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // reference: same fence, same association, driver-side
    val n = 3.0
    var r = Map("a" -> fence9(1.0 / n), "b" -> fence9(1.0 / n), "c" -> fence9(1.0 / n))
    val ow = Map("a" -> 3.0, "b" -> 1.0, "c" -> 1.0)
    for (_ <- 1 to 3) {
      val in = Map(
        "b" -> r("a") * 2.0 / ow("a"),
        "c" -> (r("a") * 1.0 / ow("a") + r("b") * 1.0 / ow("b")),
        "a" -> r("c") * 1.0 / ow("c"))
      r = r.map { case (k, _) =>
        k -> fence9((1.0 - 0.85) / n + 0.85 * in.getOrElse(k, 0.0)) }
    }
    // the 2-term sum for c may differ in the last ulp before the fence
    // depending on add order; compare at the fence's own resolution
    got.foreach { case (k, v) => assert(math.abs(v - r(k)) < 2e-9, s"node $k: $v vs ${r(k)}") }
  }

  test("dangling node mass is redistributed (ranks still sum to ~1)") {
    // d has no out-edges: its rank must recirculate, not vanish
    val edges = Seq(("a", "b", 1.0), ("b", "d", 1.0), ("d2", "a", 1.0))
      .toDF("src", "dst", "w")
    val ranks = LinkAnalysis.pageRank(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 4)
    val total = ranks.values.sum
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass $total")
    assert(ranks("b") > ranks("d2"), "b receives from a plus dangling share")
  }

  test("deterministic under repartitioning and a closed cycle concentrates rank") {
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
      ("x", "a", 1.0)).toDF("src", "dst", "w")
    val r1 = LinkAnalysis.pageRank(edges, iters = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val r2 = LinkAnalysis.pageRank(edges.repartition(7), iters = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(r1 == r2)
    val m = r1.toMap
    assert(m("a") > m("x"), "cycle member with an extra in-edge outranks the feeder")
  }

  test("purchaseGraph materializes both directions with lineitem-count weights") {
    val li = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((1L, 100L), (2L, 200L)).toDF("o_orderkey", "o_custkey")
    val g = LinkAnalysis.purchaseGraph(li, ord)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // customer 100 -> 200, 200 -> 400; supplier 10 -> 21, 20 -> 41
    assert(g == Set(
      (200L, 21L, 2.0), (21L, 200L, 2.0),
      (200L, 41L, 1.0), (41L, 200L, 1.0),
      (400L, 21L, 1.0), (21L, 400L, 1.0)))
  }
}
