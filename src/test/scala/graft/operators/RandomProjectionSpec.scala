package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def collectProj(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getSeq[Double](1).toVector, Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap

  test("projection matches a driver-side replay of the fold arithmetic " +
      "exactly, and is deterministic under repartitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("vec_id", "emb")
    val got = collectProj(RandomProjection.project(df, col("vec_id"),
      col("emb"), inDim = 8, outDim = 4))
    val got2 = collectProj(RandomProjection.project(df.repartition(7),
      col("vec_id"), col("emb"), inDim = 8, outDim = 4))
    assert(got == got2, "partitioning changed the projection")
    val s = RandomProjection.signMatrix(8, 4, "jl")
    val scale = math.sqrt(4.0)
    rows.foreach { case (id, e) =>
      val want = (0 until 4).map { j =>
        var acc = 0.0
        (0 until 8).foreach(i => acc += e(i) * s(i)(j)) // same left fold
        acc / scale
      }.toVector
      assert(got(id)._1 == want, s"row $id: ${got(id)._1} vs $want")
      var en = 0.0; e.foreach(x => en += x * x)
      var pn = 0.0; want.foreach(x => pn += x * x)
      assert(got(id)._2.contains(pn / en), s"row $id ratio")
    }
  }

  test("linearity is EXACT on small-integer vectors (±1 signs keep all " +
      "products and partial sums integral)") {
    val a = Array.tabulate(8)(i => (i % 5).toDouble)
    val b = Array.tabulate(8)(i => ((i * 3) % 7).toDouble)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((0L, a), (1L, b), (2L, ab)).toDF("vec_id", "emb")
    val got = collectProj(RandomProjection.project(df, col("vec_id"),
      col("emb"), inDim = 8, outDim = 4))
    val sum01 = got(0L)._1.zip(got(1L)._1).map { case (x, y) => x + y }
    assert(got(2L)._1 == sum01, "proj(a+b) != proj(a)+proj(b) on integers")
  }

  test("zero vectors project to zero with a NULL ratio; norm witness " +
      "concentrates on 1 over a random batch") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 500L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian()))) :+ (999L, Array.fill(64)(0.0))
    val got = collectProj(RandomProjection.project(rows.toDF("vec_id", "emb"),
      col("vec_id"), col("emb"), inDim = 64, outDim = 16))
    assert(got(999L)._1.forall(_ == 0.0) && got(999L)._2.isEmpty)
    val ratios = (0L until 500L).map(i => got(i)._2.get)
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.1, s"E[ratio] drifted: $mean")
    val inBand = ratios.count(r => r >= 0.4 && r <= 2.5)
    assert(inBand >= 475, s"only $inBand/500 inside the q150 gate band")
  }

  test("pairwise distances survive at JL distortion (the property the " +
      "compressed ANN pass relies on)") {
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 60).map(_ => Array.fill(64)(rnd.nextGaussian()))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "emb")
    val got = collectProj(RandomProjection.project(df, col("vec_id"),
      col("emb"), inDim = 64, outDim = 16))
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0 until 60; j <- (i + 1) until 60
    } yield d2(got(i.toLong)._1, got(j.toLong)._1) /
      d2(vecs(i).toVector, vecs(j).toVector)
    // d'=16: individual pairs are chi²₁₆-wide, but the bulk concentrates
    val inBand = ratios.count(r => r >= 0.4 && r <= 2.5)
    assert(inBand >= (ratios.size * 0.95).toInt,
      s"$inBand/${ratios.size} pairs inside 0.4..2.5")
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"pair-distance ratio mean: $mean")
  }
}
