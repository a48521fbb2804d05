package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight vector families far apart in angle, plus exact dups: the
  // clustering must separate the families, pairs stay within families, and
  // keepers follow min-id semantics through exact-dup collapse
  private def corpus = Seq(
    (0L, Array(1.0, 0.0, 0.0, 0.0)),
    (1L, Array(0.999, 0.01, 0.0, 0.0)),    // near-dup of 0 (cos ~0.9999)
    (2L, Array(1.0, 0.0, 0.0, 0.0)),       // exact dup of 0
    (10L, Array(0.0, 0.0, 1.0, 0.0)),
    (11L, Array(0.0, 0.0, 0.999, 0.01)),   // near-dup of 10
    (20L, Array(0.5, 0.5, 0.5, 0.5))       // isolated
  ).toDF("id", "v")

  test("semdedupKeepers drops near and exact dups, keeps min ids") {
    val out = SemDedup.semdedupKeepers(corpus, col("id"), col("v"),
        k = 3, lloydIters = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 10L, 11L, 20L))
    // family A: 0 keeps; 1 (near) and 2 (exact) drop to keeper 0
    assert(out(0L)._2 == 0L && out(0L)._3 == 0L)
    assert(out(1L)._2 == 0L && out(1L)._3 == 1L)
    assert(out(2L)._2 == 0L && out(2L)._3 == 1L)
    // family B: 10 keeps, 11 drops
    assert(out(10L)._2 == 10L && out(10L)._3 == 0L)
    assert(out(11L)._2 == 10L && out(11L)._3 == 1L)
    // isolated doc survives as its own keeper
    assert(out(20L)._2 == 20L && out(20L)._3 == 0L)
    // pairs never cross clusters: members of one component share a cell
    val cells = out.values.groupBy(_._2).map { case (_, vs) => vs.map(_._1).toSet }
    assert(cells.forall(_.size == 1), s"component spans cells: $cells")
  }

  test("semdedupKeepers is deterministic across runs") {
    def run() = SemDedup.semdedupKeepers(corpus, col("id"), col("v"),
        k = 3, lloydIters = 2, threshold = 0.99)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("semdedupKeepers on empty input returns an empty verdict") {
    val empty = Seq.empty[(Long, Array[Double])].toDF("id", "v")
    val out = SemDedup.semdedupKeepers(empty, col("id"), col("v"))
    assert(out.columns.toSeq == Seq("doc_id", "cell", "keeper", "dropped"))
    assert(out.count() == 0L)
  }

  test("semdedupKeepers with k larger than distinct vectors still works") {
    val out = SemDedup.semdedupKeepers(corpus, col("id"), col("v"),
        k = 100, lloydIters = 1, threshold = 0.99)
    assert(out.count() == 6L)
    assert(out.filter(col("dropped") === 0).count() >= 3L)
  }
}
