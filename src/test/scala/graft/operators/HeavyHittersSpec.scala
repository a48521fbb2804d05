package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus: word w_r appears ~N/r times, plus a long tail
  private def zipfDocs = {
    val rnd = new scala.util.Random(11)
    val words = (1 to 40).flatMap(r => Seq.fill(2000 / r)(s"w$r")) ++
      Seq.fill(500)(s"tail${rnd.nextInt(400)}")
    rnd.shuffle(words).grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
  }

  test("exactTopK returns counts in deterministic (cnt desc, word) order") {
    val top = HeavyHitters.exactTopK(zipfDocs, col("text"), 5)
      .as[(String, Long)].collect()
    assert(top.head == (("w1", 2000)))
    assert(top(1) == (("w2", 1000)))
    // non-increasing counts, ties by word
    top.sliding(2).foreach { case Array((wa, ca), (wb, cb)) =>
      assert(ca > cb || (ca == cb && wa < wb))
    }
  }

  test("Misra-Gries candidates contain every token above the n/capacity bound") {
    val docs = zipfDocs
    val n = docs.select(explode(graft.functions.TextOps.tokens(col("text"))))
      .count()
    val capacity = 64
    val cands = HeavyHitters.misraGriesCandidates(docs, col("text"), capacity)
    assert(cands.size <= capacity)
    val exact = HeavyHitters.exactTopK(docs, col("text"), 1000)
      .as[(String, Long)].collect()
    val mustSurvive = exact.filter(_._2 > n / capacity).map(_._1)
    assert(mustSurvive.nonEmpty)
    val missing = mustSurvive.filterNot(cands.contains)
    assert(missing.isEmpty, s"frequency guarantee violated for: ${missing.toSeq}")
    // and the kept counts are valid lower bounds within n/capacity slack
    val exactMap = exact.toMap
    cands.foreach { case (w, c) =>
      val trueC = exactMap.getOrElse(w, 0L)
      assert(c <= trueC && trueC - c <= n / capacity,
        s"$w: sketch $c vs exact $trueC (slack ${n / capacity})")
    }
  }
}
