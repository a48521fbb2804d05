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

  test("union estimates are split-invariant; direct HIP builds are not an anchor") {
    // register-max merge state is order-independent and the union path
    // estimates from it (composite estimator), so ANY batching of the
    // same stream unions to bit-identical estimates — the q111 merge gate
    val big = (0 until 80000).map(i => (i.toLong, s"k${i % 20000}")).toDF("id", "u")
    val dir3 = tmpDir(); val dir2 = tmpDir()
    (0 until 3).foreach(b => Sketches.appendCardinalitySketches(
      big.filter(pmod(col("id"), lit(3)) === b), Seq("u"), dir3, b.toLong))
    (0 until 2).foreach(b => Sketches.appendCardinalitySketches(
      big.filter(pmod(col("id"), lit(2)) === b), Seq("u"), dir2, b.toLong))
    val u3 = Sketches.estimateCardinalities(spark, dir3).collect()(0).getLong(3)
    val u2 = Sketches.estimateCardinalities(spark, dir2).collect()(0).getLong(3)
    assert(u3 == u2, s"split-variant union estimates: $u3 vs $u2")
    // and the union stays near truth (20k distinct, lgK=12 ~ 1.6% RSE)
    assert(math.abs(u3 - 20000.0) / 20000.0 < 0.05, u3.toString)
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

  // ---------------- Count-Min ----------------------------------------

  test("CMS: estimates never undercount and are exact away from collisions") {
    val dir = tmpDir()
    val toks = (Seq.fill(500)("alpha") ++ Seq.fill(120)("beta") ++
      Seq.fill(7)("gamma") ++ (0 until 300).map(i => s"noise$i"))
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    Sketches.appendFrequencySketches(df, col("t"), dir, 0L)
    val est = Sketches.cmsEstimate(spark, dir,
        Seq("alpha", "beta", "gamma", "absent"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 500L && est("alpha") <= 510L, est.toString)
    assert(est("beta") >= 120L && est("beta") <= 130L)
    assert(est("gamma") >= 7L && est("gamma") <= 17L)
    assert(est("absent") >= 0L && est("absent") <= 10L)
  }

  test("CMS: merged batch sketches equal the single whole-data sketch") {
    val all = (0 until 4000).map(i => (i.toLong, s"w${i % 97}")).toDF("id", "t")
    val split = tmpDir(); val whole = tmpDir()
    Sketches.appendFrequencySketches(all.filter(col("id") % 2 === 0), col("t"), split, 0L)
    Sketches.appendFrequencySketches(all.filter(col("id") % 2 === 1), col("t"), split, 1L)
    Sketches.appendFrequencySketches(all, col("t"), whole, 0L)
    val keys = (0 until 97 by 13).map(i => s"w$i") :+ "w3"
    val a = Sketches.cmsEstimate(spark, split, keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sketches.cmsEstimate(spark, whole, keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, s"$a != $b")
  }

  test("CMS: a retried batch overwrites its own partition") {
    val dir = tmpDir()
    val d0 = (0 until 100).map(i => (i.toLong, "x")).toDF("id", "t")
    Sketches.appendFrequencySketches(d0, col("t"), dir, 0L)
    Sketches.appendFrequencySketches(d0, col("t"), dir, 0L) // retry
    val est = Sketches.cmsEstimate(spark, dir, Seq("x")).collect()(0).getLong(1)
    assert(est == 100L, est.toString)
  }

  // ---------------- histogram quantiles --------------------------------

  test("histogram quantiles: uniform data estimates within one bin width") {
    val dir = tmpDir()
    val vals = (0 until 10000).map(i => (i.toLong, (i % 1000).toDouble)).toDF("id", "v")
    Sketches.appendHistogramSketches(vals, col("v"), dir, 0L, lo = 0.0, hi = 1000.0, bins = 100)
    val est = Sketches.histQuantiles(spark, dir, Seq(0.25, 0.5, 0.9),
        lo = 0.0, hi = 1000.0, bins = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(est(0.25) - 250.0) <= 10.0, est.toString)
    assert(math.abs(est(0.5) - 500.0) <= 10.0)
    assert(math.abs(est(0.9) - 900.0) <= 10.0)
  }

  test("histogram quantiles: merged batches equal the whole-data build; clamping") {
    val all = (0 until 5000).map(i => (i.toLong, (i % 700).toDouble - 100.0)).toDF("id", "v")
    val split = tmpDir(); val whole = tmpDir()
    // range [0, 500) deliberately misses [-100, 0) and [500, 600): clamps
    Sketches.appendHistogramSketches(all.filter(col("id") % 2 === 0), col("v"), split, 0L, 0.0, 500.0, 50)
    Sketches.appendHistogramSketches(all.filter(col("id") % 2 === 1), col("v"), split, 1L, 0.0, 500.0, 50)
    Sketches.appendHistogramSketches(all, col("v"), whole, 0L, 0.0, 500.0, 50)
    val qs = Seq(0.05, 0.5, 0.95)
    val a = Sketches.histQuantiles(spark, split, qs, 0.0, 500.0, 50)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val b = Sketches.histQuantiles(spark, whole, qs, 0.0, 500.0, 50)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(a == b, s"$a != $b")
    // all estimates stay inside the fixed range despite out-of-range input
    assert(a.values.forall(v => v >= 0.0 && v <= 500.0), a.toString)
  }

  // ---------------- compaction (the BM25 fold pattern) ------------------

  private def parquetFiles(p: String): Long = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try walk.filter(f => f.toString.endsWith(".parquet")).count()
    finally walk.close()
  }

  test("cardinality compaction: identical estimates, fewer files, " +
       "folded-replay no-op, appends keep working") {
    val dir = tmpDir()
    (0 until 3).foreach(b => Sketches.appendCardinalitySketches(
      df(b * 300 until (b + 1) * 300), Seq("u", "t"), dir, b.toLong))
    def est() = Sketches.estimateCardinalities(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val before = est()
    val filesBefore = parquetFiles(dir)
    Sketches.compactCardinalitySketches(spark, dir)
    assert(est() == before, "compaction changed the served estimates")
    assert(parquetFiles(dir) < filesBefore,
      s"no file-count drop: $filesBefore -> ${parquetFiles(dir)}")
    // a replayed, already-folded batch must be a no-op (its rows live in
    // the base partition now)
    Sketches.appendCardinalitySketches(df(300 until 600), Seq("u", "t"), dir, 1L)
    assert(est() == before, "folded-batch replay double-counted")
    // a NEW batch after compaction adds mass over the union
    Sketches.appendCardinalitySketches(df(900 until 1200), Seq("u", "t"), dir, 3L)
    val after = est()
    assert(after.find(_._1 == "u").get._2 == 1200L) // n_rows summed
    assert(after.find(_._1 == "u").get._3 == 4L)    // batch count preserved
    assert(after.find(_._1 == "u").get._4 == 37L)   // coupon-exact distinct
    // re-compacting an already-compacted dir is stable
    Sketches.compactCardinalitySketches(spark, dir)
    assert(est() == after, "re-compaction changed the served estimates")
  }

  test("CMS compaction: identical estimates, fewer files, folded-replay no-op") {
    val dir = tmpDir()
    val all = (0 until 3000).map(i => (i.toLong, s"w${i % 61}")).toDF("id", "t")
    (0 until 3).foreach(b => Sketches.appendFrequencySketches(
      all.filter(col("id") % 3 === b), col("t"), dir, b.toLong))
    val keys = Seq("w0", "w7", "w60", "zz_absent")
    def est() = Sketches.cmsEstimate(spark, dir, keys).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val before = est()
    val filesBefore = parquetFiles(dir)
    Sketches.compactFrequencySketches(spark, dir)
    assert(est() == before, "compaction changed the served estimates")
    assert(parquetFiles(dir) < filesBefore)
    Sketches.appendFrequencySketches(all.filter(col("id") % 3 === 1),
      col("t"), dir, 1L)
    assert(est() == before, "folded-batch replay double-counted")
    // post-compaction append: every one of w0's bucket cells gains exactly
    // +500, so the min-over-rows estimate moves by exactly +500
    val extra = (0 until 500).map(i => (i.toLong, "w0")).toDF("id", "t")
    Sketches.appendFrequencySketches(extra, col("t"), dir, 3L)
    val w0 = Sketches.cmsEstimate(spark, dir, Seq("w0")).collect()(0).getLong(1)
    assert(w0 == before.find(_._1 == "w0").get._2 + 500L, w0.toString)
  }

  test("histogram compaction: identical quantiles, fewer files, folded-replay no-op") {
    val dir = tmpDir()
    val all = (0 until 9000).map(i => (i.toLong, (i % 900).toDouble)).toDF("id", "v")
    (0 until 3).foreach(b => Sketches.appendHistogramSketches(
      all.filter(col("id") % 3 === b), col("v"), dir, b.toLong, 0.0, 900.0, 90))
    val qs = Seq(0.1, 0.5, 0.95)
    def est() = Sketches.histQuantiles(spark, dir, qs, 0.0, 900.0, 90).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val before = est()
    val filesBefore = parquetFiles(dir)
    Sketches.compactHistogramSketches(spark, dir)
    assert(est() == before, "compaction changed the served quantiles")
    assert(parquetFiles(dir) < filesBefore)
    Sketches.appendHistogramSketches(all.filter(col("id") % 3 === 2),
      col("v"), dir, 2L, 0.0, 900.0, 90)
    assert(est() == before, "folded-batch replay double-counted")
    // a new batch after compaction shifts the distribution as it should
    val hiVals = (0 until 9000).map(i => (i.toLong, 899.0)).toDF("id", "v")
    Sketches.appendHistogramSketches(hiVals, col("v"), dir, 3L, 0.0, 900.0, 90)
    val p50 = Sketches.histQuantiles(spark, dir, Seq(0.5), 0.0, 900.0, 90)
      .collect()(0).getDouble(1)
    assert(p50 > before.find(_._1 == 0.5).get._2, p50.toString)
  }

  test("compaction recovers from a stale __fold_old left by a prior crash") {
    val dir = tmpDir()
    (0 until 2).foreach(b => Sketches.appendFrequencySketches(
      (0 until 100).map(i => (i.toLong, s"t${i % 9}")).toDF("id", "t"),
      col("t"), dir, b.toLong))
    val before = Sketches.cmsEstimate(spark, dir, Seq("t0", "t8")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // simulate a crash that left the previous data parked under _old
    val old = new java.io.File(dir + "__fold_old")
    assert(old.mkdir())
    assert(new java.io.File(old, "leftover.txt").createNewFile())
    Sketches.compactFrequencySketches(spark, dir)
    val after = Sketches.cmsEstimate(spark, dir, Seq("t0", "t8")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before, "stale __fold_old corrupted the fold")
    assert(!old.exists(), "stale __fold_old must be cleaned up")
  }

  test("a retried batch with EMPTY input clears its stale partition") {
    // dynamic overwrite alone replaces only partitions the retry emits —
    // an empty retry emits none; the batch-prefix delete must still win
    val dir = tmpDir()
    Sketches.appendFrequencySketches(
      (0 until 100).map(i => (i.toLong, "x")).toDF("id", "t"), col("t"), dir, 0L)
    Sketches.appendFrequencySketches(
      (0 until 50).map(i => (i.toLong, "y")).toDF("id", "t"), col("t"), dir, 1L)
    Sketches.appendFrequencySketches(
      (0 until 0).map(i => (i.toLong, "y")).toDF("id", "t"), col("t"), dir, 1L)
    val est = Sketches.cmsEstimate(spark, dir, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("x") == 100L, est.toString) // batch 0 untouched
    assert(est("y") == 0L, est.toString)   // batch 1's stale rows gone
  }

  test("KMV: under-k regime is exact, for counts and all set operations") {
    val dirA = tmpDir(); val dirB = tmpDir()
    // A = 0..79, B = 40..119 → |A| = |B| = 80, ∩ = 40, ∪ = 120, J = 1/3
    Sketches.appendKmvSketches(
      (0 until 80).map(i => (i.toLong, s"v$i")).toDF("id", "t"), col("t"), dirA, 0L)
    Sketches.appendKmvSketches(
      (40 until 120).map(i => (i.toLong, s"v$i")).toDF("id", "t"), col("t"), dirB, 0L)
    val ea = Sketches.kmvEstimate(spark, dirA).collect()(0)
    assert(ea.getLong(0) == 80L && ea.getDouble(1) == 80.0)
    val ov = Sketches.kmvOverlap(spark, dirA, dirB).collect()(0)
    assert(ov.getLong(0) == 120L && ov.getLong(1) == 40L)
    assert(ov.getDouble(2) == 120.0, "union_est exact under k")
    // inter_est replays ρ·est in IEEE: (40/120)·120 ≠ 40 by an ulp,
    // and the 6-dp fence preserves that — pin the fenced value
    val expInter = math.floor(40.0 / 120.0 * 120.0 * 1e6 + 0.5) / 1e6
    assert(ov.getDouble(3) == expInter, s"inter_est ${ov.getDouble(3)}")
    assert(math.abs(ov.getDouble(4) - 0.333333) < 1e-9, "jaccard = fenced 1/3")
  }

  test("KMV: split-invariant (bit-identical served sketch across batchings)") {
    val big = (0 until 60000).map(i => (i.toLong, s"k${i % 20000}")).toDF("id", "t")
    val dir3 = tmpDir(); val dir2 = tmpDir()
    (0 until 3).foreach(b => Sketches.appendKmvSketches(
      big.filter(pmod(col("id"), lit(3)) === b), col("t"), dir3, b.toLong))
    (0 until 2).foreach(b => Sketches.appendKmvSketches(
      big.filter(pmod(col("id"), lit(2)) === b), col("t"), dir2, b.toLong))
    val e3 = Sketches.kmvEstimate(spark, dir3).collect()(0)
    val e2 = Sketches.kmvEstimate(spark, dir2).collect()(0)
    assert(e3 == e2, s"split-variant KMV estimates: $e3 vs $e2")
    // ... and within the order-statistics error envelope (RSE ~ 1/√(k−2))
    assert(math.abs(e3.getDouble(1) - 20000.0) <= 0.15 * 20000.0, e3.toString)
  }

  test("KMV: overlap estimates track a planted Jaccard at sketch error") {
    // A = 0..14999, B = 7500..22499 → ∪ = 22500, ∩ = 7500, J = 1/3
    val dirA = tmpDir(); val dirB = tmpDir()
    Sketches.appendKmvSketches(
      (0 until 15000).map(i => (i.toLong, s"d$i")).toDF("id", "t"), col("t"), dirA, 0L)
    Sketches.appendKmvSketches(
      (7500 until 22500).map(i => (i.toLong, s"d$i")).toDF("id", "t"), col("t"), dirB, 0L)
    val ov = Sketches.kmvOverlap(spark, dirA, dirB).collect()(0)
    assert(ov.getLong(0) == 1024L, "sketch full at this cardinality")
    assert(math.abs(ov.getDouble(4) - 1.0 / 3) < 0.06,
      s"jaccard ${ov.getDouble(4)} vs 1/3")
    assert(math.abs(ov.getDouble(2) - 22500.0) <= 0.15 * 22500.0, ov.toString)
    assert(math.abs(ov.getDouble(3) - 7500.0) <= 0.2 * 7500.0, ov.toString)
  }

  test("KMV compaction: bit-identical serve, fewer files, folded-replay no-op") {
    val dir = tmpDir(); val dirB = tmpDir()
    val all = (0 until 30000).map(i => (i.toLong, s"w${i % 9000}")).toDF("id", "t")
    (0 until 3).foreach(b => Sketches.appendKmvSketches(
      all.filter(col("id") % 3 === b), col("t"), dir, b.toLong))
    Sketches.appendKmvSketches(
      (0 until 4000).map(i => (i.toLong, s"w${i * 2}")).toDF("id", "t"),
      col("t"), dirB, 0L)
    def serve() = (Sketches.kmvEstimate(spark, dir).collect()(0),
      Sketches.kmvOverlap(spark, dir, dirB).collect()(0))
    val before = serve()
    val filesBefore = parquetFiles(dir)
    Sketches.compactKmvSketches(spark, dir)
    assert(serve() == before, "compaction changed the served estimates")
    assert(parquetFiles(dir) < filesBefore)
    Sketches.appendKmvSketches(all.filter(col("id") % 3 === 1), col("t"), dir, 1L)
    assert(serve() == before, "folded-batch replay changed the sketch")
    // a post-compaction batch of strictly new values grows the estimate
    Sketches.appendKmvSketches(
      (0 until 9000).map(i => (i.toLong, s"x$i")).toDF("id", "t"),
      col("t"), dir, 3L)
    assert(serve()._1.getDouble(1) > before._1.getDouble(1))
  }

  test("rank sketch: under-k regime is exact order statistics") {
    val dir = tmpDir()
    // 100 values < k: the sample IS the data, the pick is the exact
    // ceil(q·100)-th order statistic
    val vals = (1 to 100).map(i => (i.toLong, i.toDouble * 10))
    Sketches.appendRankSketches(vals.toDF("id", "v"), col("v"), col("id"),
      dir, 0L, k = 4096)
    val got = Sketches.rankQuantiles(spark, dir, Seq(0.01, 0.25, 0.5, 0.995))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.01) == 10.0)    // ceil(1.0) = 1st
    assert(got(0.25) == 250.0)   // ceil(25.0) = 25th
    assert(got(0.5) == 500.0)    // ceil(50.0) = 50th
    assert(got(0.995) == 1000.0) // ceil(99.5) = 100th
  }

  test("rank sketch: split-invariant (bit-identical sample and quantiles " +
      "across batchings)") {
    val big = (0 until 50000).map(i => (i.toLong, ((i * 7919) % 50000).toDouble))
      .toDF("id", "v")
    val dir3 = tmpDir(); val dir2 = tmpDir()
    (0 until 3).foreach(b => Sketches.appendRankSketches(
      big.filter(pmod(col("id"), lit(3)) === b), col("v"), col("id"), dir3, b.toLong))
    (0 until 2).foreach(b => Sketches.appendRankSketches(
      big.filter(pmod(col("id"), lit(2)) === b), col("v"), col("id"), dir2, b.toLong))
    val qs = Seq(0.1, 0.5, 0.9)
    val e3 = Sketches.rankQuantiles(spark, dir3, qs).collect().toSeq
    val e2 = Sketches.rankQuantiles(spark, dir2, qs).collect().toSeq
    assert(e3 == e2, s"split-variant rank quantiles: $e3 vs $e2")
    // values are a permutation of 0..49999: true quantile(q) ≈ 50000q,
    // DKW at k=4096 bounds the rank error well under 4.5%
    e3.foreach { r =>
      val (q, est) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(est / 50000.0 - q) <= 0.045, s"q=$q est=$est") }
  }

  test("rank compaction: bit-identical quantiles, fewer files, " +
      "folded-replay no-op; duplicate-heavy values stay unbiased") {
    val dir = tmpDir()
    // 30000 rows but only 3 distinct values, 80% of mass on 7.0: a
    // DISTINCT-based sample would collapse to 3 rows and misplace every
    // quantile; the row-keyed sample must put the median on the heavy value
    val rows = (0 until 30000).map { i =>
      (i.toLong, if (i % 10 < 8) 7.0 else if (i % 10 == 8) 1.0 else 9.0) }
    (0 until 3).foreach(b => Sketches.appendRankSketches(
      rows.toDF("id", "v").filter(pmod(col("id"), lit(3)) === b),
      col("v"), col("id"), dir, b.toLong))
    val qs = Seq(0.1, 0.5, 0.9)
    def serve() = Sketches.rankQuantiles(spark, dir, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val before = serve()
    assert(before(0.5) == 7.0, s"median must land on the 80% value: $before")
    assert(before(0.1) == 1.0 || before(0.1) == 7.0)
    val filesBefore = parquetFiles(dir)
    Sketches.compactRankSketches(spark, dir)
    assert(serve() == before, "compaction changed the served quantiles")
    assert(parquetFiles(dir) < filesBefore)
    Sketches.appendRankSketches(
      rows.toDF("id", "v").filter(pmod(col("id"), lit(3)) === 1L),
      col("v"), col("id"), dir, 1L)
    assert(serve() == before, "folded-batch replay changed the sketch")
  }

  test("rank sketch: k persists in the artifact — derived on serve, " +
      "mismatches rejected, survives compaction") {
    val dir = tmpDir()
    val rows = (0 until 5000).map(i => (i.toLong, ((i * 31) % 5000).toDouble))
    Sketches.appendRankSketches(rows.toDF("id", "v").filter(col("id") < 2500),
      col("v"), col("id"), dir, 0L, k = 64)
    // appending at a different k is a contract violation, not a silent union
    val eApp = intercept[IllegalArgumentException] {
      Sketches.appendRankSketches(rows.toDF("id", "v"),
        col("v"), col("id"), dir, 1L, k = 128) }
    assert(eApp.getMessage.contains("k=64"))
    Sketches.appendRankSketches(rows.toDF("id", "v").filter(col("id") >= 2500),
      col("v"), col("id"), dir, 1L, k = 64)
    // default serve derives k=64 from the sidecar (equals explicit k=64)
    val qs = Seq(0.25, 0.75)
    val derived = Sketches.rankQuantiles(spark, dir, qs).collect().toSeq
    assert(derived == Sketches.rankQuantiles(spark, dir, qs, k = 64)
      .collect().toSeq)
    // serving at a larger k than the appends used is rejected
    val eServe = intercept[IllegalArgumentException] {
      Sketches.rankQuantiles(spark, dir, qs, k = 4096) }
    assert(eServe.getMessage.contains("k=64"))
    // the sidecar survives the fold swap; serve stays bit-identical
    Sketches.compactRankSketches(spark, dir)
    assert(Sketches.storedRankK(spark, dir).contains(64))
    assert(Sketches.rankQuantiles(spark, dir, qs).collect().toSeq == derived)
  }

  test("groupRankQuantiles: under-k groups are exact order statistics; " +
      "kept multiset equals ORDER BY (h, v) LIMIT k per group") {
    // group "a": 2000 rows (> k=64, real sampling); group "b": 10 rows
    val rows = (0 until 2000).map(i => ("a", i.toLong, ((i * 37) % 2000).toDouble)) ++
      (0 until 10).map(i => ("b", 10000L + i, (i * 100).toDouble))
    val df = rows.toDF("g", "id", "v")
    val got = Sketches.groupRankQuantiles(df, Seq("g"), col("v"), col("id"),
        Seq(0.1, 0.5, 0.9), k = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    // group b holds the whole value set: exact ceil(q·10) order statistics
    assert(got(("b", 0.1)) == ((0.0, 10L)))    // ceil(1.0) = 1st of 0,100,...
    assert(got(("b", 0.5)) == ((400.0, 10L)))  // ceil(5.0) = 5th
    assert(got(("b", 0.9)) == ((800.0, 10L)))  // ceil(9.0) = 9th
    // group a: replay the md5 bottom-k by hand and pick the same indices
    def u52(key: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key|rank".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    val kept = rows.filter(_._1 == "a")
      .map { case (_, id, v) => (u52(id.toString), v) }
      .sorted.take(64).map(_._2).sorted
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val want = kept(math.max(math.ceil(q * 64).toInt, 1) - 1)
      assert(got(("a", q))._1 == want && got(("a", q))._2 == 64L, s"q=$q")
    }
    // DKW at k=64 (eps ~0.35 at 1e-6; values are a 0..1999 permutation):
    // even this tiny sketch pins the median loosely
    assert(math.abs(got(("a", 0.5))._1 / 2000.0 - 0.5) < 0.35)
  }

  test("groupRankQuantiles is partitioning-invariant (bounded aggregator " +
      "merges are order-insensitive)") {
    val rows = (0 until 5000).map(i =>
      (s"g${i % 3}", i.toLong, ((i * 101) % 5000).toDouble))
    val df = rows.toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.groupRankQuantiles(d, Seq("g"), col("v"), col("id"),
          Seq(0.25, 0.75), k = 128)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))).toSet
    assert(run(df.repartition(17)) == run(df.coalesce(1)))
  }

  test("an empty batch contributes an empty sketch that adds no mass") {
    val dir = tmpDir()
    Sketches.appendCardinalitySketches(df(0 until 300), Seq("u"), dir, 0L)
    Sketches.appendCardinalitySketches(df(0 until 0), Seq("u"), dir, 1L)
    val r = Sketches.estimateCardinalities(spark, dir).collect()(0)
    assert(r.getLong(1) == 300L)  // n_rows unchanged
    assert(r.getLong(2) == 2L)    // the empty sketch row is present...
    assert(r.getLong(3) == 37L)   // ...but contributes no distinct mass
  }
}
