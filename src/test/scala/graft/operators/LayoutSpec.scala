package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the reference interleave on random coordinates") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 10), s"($x,$y)")
    }
    // masking: out-of-range bits are dropped, not corrupting
    val masked = Seq((1024L + 3L, 5L)).toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 10))
      .head().getLong(2)
    assert(masked == mortonRef(3L, 5L, 10))
  }

  test("zValue is monotone under coordinate dominance (the pruning invariant)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 2000) {
      val x1 = rnd.nextInt(256).toLong; val y1 = rnd.nextInt(256).toLong
      val x2 = x1 + rnd.nextInt(256 - x1.toInt).toLong
      val y2 = y1 + rnd.nextInt(256 - y1.toInt).toLong
      assert(mortonRef(x1, y1, 8) <= mortonRef(x2, y2, 8))
    }
  }

  test("clusterByZ makes per-partition min/max stats prune a 2-D box query") {
    // full 256x256 grid, 16 range partitions over the z-value
    val grid = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("x"),
        pmod(col("id"), lit(256L)).as("y"))
    val clustered = Layout.clusterByZ(grid, Seq(col("x"), col("y")), bits = 8,
      partitions = 16)
    val stats = clustered
      .select(spark_partition_id().as("p"), col("__z"))
      .groupBy("p").agg(min("__z").as("lo"), max("__z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(stats.length == 16)
    // box query x,y in [64,79]^2: its z-values live in [z(64,64), z(79,79)]
    // by the dominance invariant, so only partitions overlapping that range
    // can contain matches
    val zLo = mortonRef(64, 64, 8); val zHi = mortonRef(79, 79, 8)
    val touched = stats.count { case (lo, hi) => hi >= zLo && lo <= zHi }
    assert(touched <= 2, s"z-clustered box touched $touched/16 partitions")
    // the same box under a random layout touches every partition
    val randomStats = grid
      .withColumn("__z", Layout.zValue(Seq(col("x"), col("y")), 8))
      .repartition(16)
      .select(spark_partition_id().as("p"), col("__z"))
      .groupBy("p").agg(min("__z").as("lo"), max("__z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val touchedRandom = randomStats.count { case (lo, hi) => hi >= zLo && lo <= zHi }
    assert(touchedRandom == 16, "random layout should be unprunable")
  }

  test("rendezvousShard: minimal disruption when growing the shard count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (0L until 5000L).toDF("k")
    val a = keys.select(col("k"),
        Layout.rendezvousShard(col("k"), 8).as("s8"),
        Layout.rendezvousShard(col("k"), 9).as("s9"))
      .as[(Long, Int, Int)].collect()
    // rows land on every shard, roughly evenly
    val by8 = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(by8.keySet == (0 until 8).toSet)
    assert(by8.values.min > 5000 / 8 / 2, s"badly skewed: $by8")
    // THE rendezvous property: a row either keeps its shard or moves to
    // the NEW shard — never between old shards
    assert(a.forall { case (_, s8, s9) => s9 == s8 || s9 == 8 },
      "a row moved between pre-existing shards")
    val movedFrac = a.count { case (_, s8, s9) => s8 != s9 }.toDouble / a.length
    assert(movedFrac > 0.05 && movedFrac < 0.18,
      s"moved fraction $movedFrac far from the expected 1/9")
  }
}
