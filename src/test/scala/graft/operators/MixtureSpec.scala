package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"src${i % 4}")).toDF("doc_id", "source")

  test("epochs guarantees floor(w) copies and caps at ceil(w)") {
    val w = Mixture.weightFor(col("source"),
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4), default = 0.15)
    val counts = Mixture.epochs(docs(2000), col("doc_id"), w)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    counts.foreach {
      case ("src0", n) => assert(n == 2L || n == 3L)
      case ("src1", n) => assert(n == 1L)
      case ("src2", n) => assert(n == 1L) // kept docs have exactly 1 epoch
      case ("src3", n) => assert(n == 1L)
      case other       => fail(s"unexpected $other")
    }
    // epoch indices are dense 0..n-1 per doc
    val eps = Mixture.epochs(docs(100), col("doc_id"), w)
      .groupBy("doc_id").agg(collect_list("epoch").as("e"))
      .collect().map(_.getSeq[Long](1).sorted)
    eps.foreach(e => assert(e == (0L until e.length.toLong)))
  }

  test("realized mix tracks the target weights") {
    val n = 4000
    val w = Mixture.weightFor(col("source"),
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4), default = 0.15)
    val mix = Mixture.epochs(docs(n), col("doc_id"), w)
      .groupBy("source").agg(count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = n / 4.0
    def ratio(s: String) = mix.getOrElse(s, 0L) / perSource
    assert(math.abs(ratio("src0") - 2.5) < 0.15, s"src0 ${ratio("src0")}")
    assert(ratio("src1") == 1.0)
    assert(math.abs(ratio("src2") - 0.4) < 0.1, s"src2 ${ratio("src2")}")
    assert(math.abs(ratio("src3") - 0.15) < 0.1, s"src3 ${ratio("src3")}")
  }

  test("sample is deterministic in (id, salt) and changes with the salt") {
    val w = Mixture.weightFor(col("source"), Map("src0" -> 0.5), default = 0.5)
    def kept(salt: String) = Mixture.epochs(docs(1000), col("doc_id"), w, salt)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = kept("mix"); val b = kept("mix"); val c = kept("other-salt")
    assert(a == b, "same salt must reproduce the same sample")
    assert(a != c, "different salt should draw a different sample")
  }

  test("hashSplit: realized fractions, full coverage, and append stability") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Mixture.hashSplit(docs(5000), col("doc_id"), fr)
    val counts = split.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000, "every row must get a split")
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 5000.0 - 0.1) < 0.02)
    // append stability: assignments over a SUBSET equal the full corpus'
    // assignments restricted to it — growing the corpus never resplits
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Mixture.hashSplit(df, col("doc_id"), fr)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = assign(docs(1000))
    val full = assign(docs(5000))
    assert(small.forall { case (id, s) => full(id) == s },
      "existing docs must keep their split when the corpus grows")
  }

  test("hashSplit: remainder falls into the last label; degenerate fractions rejected") {
    val fr = Seq("a" -> 0.5, "b" -> 0.25) // sums to 0.75 — rest goes to b
    val counts = Mixture.hashSplit(docs(4000), col("doc_id"), fr)
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 4000)
    assert(math.abs(counts("a") / 4000.0 - 0.5) < 0.03)
    assert(math.abs(counts("b") / 4000.0 - 0.5) < 0.03, "b gets 0.25 + remainder")
    intercept[IllegalArgumentException](
      Mixture.hashSplit(docs(10), col("doc_id"), Seq("a" -> 0.9, "b" -> 0.3)))
    intercept[IllegalArgumentException](
      Mixture.hashSplit(docs(10), col("doc_id"), Seq.empty))
  }

  test("tokenBudgetPlan: upsampled scarce domain, capped rich domain, zero-weight leftover") {
    val corpus = Seq(
      ("wiki", 100L), ("wiki", 100L),        // scarce: 200 tokens
      ("web", 4000L), ("web", 4000L),        // rich: 8000 tokens
      ("junk", 500L)                         // not in targets
    ).toDF("dom", "tk")
    val plan = Mixture.tokenBudgetPlan(corpus, col("dom"), col("tk"),
        Map("wiki" -> 0.25, "web" -> 0.75), budget = 4000L)
      .orderBy("domain")
      .select("domain", "available_tokens", "weight", "target_tokens",
        "epochs", "sample_rate")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(plan == Seq(
      ("junk", 500L, 0.0, 0.0, 0.0, 0.0),
      ("web", 8000L, 0.75, 3000.0, 0.375, 0.375),
      ("wiki", 200L, 0.25, 1000.0, 5.0, 1.0)), s"unexpected plan: $plan")
    intercept[IllegalArgumentException](
      Mixture.tokenBudgetPlan(corpus, col("dom"), col("tk"), Map("wiki" -> 1.0), 0L))
    intercept[IllegalArgumentException](
      Mixture.tokenBudgetPlan(corpus, col("dom"), col("tk"), Map("wiki" -> 0.0), 10L))
    // a target domain missing from the corpus still plans, with zero
    // availability — its budget share must not silently vanish
    val withMissing = Mixture.tokenBudgetPlan(corpus, col("dom"), col("tk"),
        Map("wiki" -> 0.5, "absent" -> 0.5), budget = 4000L)
      .orderBy("domain")
      .select("domain", "available_tokens", "weight", "target_tokens", "epochs")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(withMissing.exists(r => r._1 == "absent" && r._2 == 0L &&
      r._3 == 0.5 && r._4 == 2000.0 && r._5 == 0.0),
      s"missing domain dropped from the plan: $withMissing")
  }

  test("temperatureWeights: closed-form alpha flattening and alpha=1 identity") {
    import spark.implicits._
    val docs = ((0 until 80).map(i => (i.toLong, "A")) ++
      (80 until 100).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val w = Mixture.temperatureWeights(docs, col("source"), alpha = 0.5,
        targetRows = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // p = .8/.2 -> sqrt = .894427191/.447213595, shares 2/3 and 1/3
    assert(w("A")._1 == 80L && w("B")._1 == 20L)
    assert(math.abs(w("A")._3 - 2.0 / 3) < 1e-8, w("A").toString)
    assert(math.abs(w("B")._3 - 1.0 / 3) < 1e-8)
    assert(math.abs(w("A")._4 - (2.0 / 3 * 100 / 80)) < 1e-8)
    assert(math.abs(w("B")._4 - (1.0 / 3 * 100 / 20)) < 1e-8)
    // tail source upweighted, head downweighted
    assert(w("B")._4 > 1.0 && w("A")._4 < 1.0)
    // alpha = 1 keeps natural proportions: every weight = target/N
    val w1 = Mixture.temperatureWeights(docs, col("source"), alpha = 1.0,
        targetRows = 200L)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(w1.values.forall(v => math.abs(v - 2.0) < 1e-8), w1.toString)
  }
}
