package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_hll_spec_").toString

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"u${i % 37}", s"t${i % 5}")).toDF("id", "u", "t")

  test("batch sketches union to near-exact small-cardinality estimates") {
    val dir = tmpDir()
    Sketches.appendCardinalitySketches(df(0 until 400), Seq("u", "t"), dir, 0L)
    Sketches.appendCardinalitySketches(df(400 until 800), Seq("u", "t"), dir, 1L)
    val est = Sketches.estimateCardinalities(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(est("u")._1 == 800L && est("u")._2 == 2L)
    // tiny cardinalities sit in the sketch's exact (coupon) regime
    assert(est("u")._3 == 37L, est("u").toString)
    assert(est("t")._3 == 5L, est("t").toString)
  }

  test("union of batch sketches equals the full-rescan sketch estimate") {
    val dir = tmpDir()
    val all = df(0 until 3000)
    (0 until 3).foreach(b => Sketches.appendCardinalitySketches(
      all.filter(pmod(col("id"), lit(3)) === b), Seq("u"), dir, b.toLong))
    val unioned = Sketches.estimateCardinalities(spark, dir)
      .collect()(0).getLong(3)
    val full = all.agg(hll_sketch_estimate(
      hll_sketch_agg(col("u").cast("string"), lit(12)))).collect()(0).getLong(0)
    assert(unioned == full, s"$unioned != $full")
  }

  test("a retried batch overwrites its own partition (idempotent)") {
    val dir = tmpDir()
    Sketches.appendCardinalitySketches(df(0 until 500), Seq("u"), dir, 0L)
    Sketches.appendCardinalitySketches(df(500 until 900), Seq("u"), dir, 1L)
    val before = Sketches.estimateCardinalities(spark, dir).collect()(0)
    // retry batch 1 with identical input
    Sketches.appendCardinalitySketches(df(500 until 900), Seq("u"), dir, 1L)
    val after = Sketches.estimateCardinalities(spark, dir).collect()(0)
    assert(before.getLong(1) == after.getLong(1))   // n_rows unchanged
    assert(before.getLong(2) == after.getLong(2))   // still 2 batches
    assert(before.getLong(3) == after.getLong(3))
  }

  test("estimates stay within the 5% gate at larger cardinality") {
    val dir = tmpDir()
    val big = (0 until 60000).map(i => (i.toLong, s"k$i")).toDF("id", "u")
    Sketches.appendCardinalitySketches(big, Seq("u"), dir, 0L)
    val est = Sketches.estimateCardinalities(spark, dir).collect()(0).getLong(3)
    assert(math.abs(est - 60000.0) / 60000.0 < 0.05, est.toString)
  }
}
