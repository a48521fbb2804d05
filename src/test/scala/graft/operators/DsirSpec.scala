package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target-like docs speak "alpha beta gamma"; off-target docs speak
  // "xray yankee zulu"; one mixed doc sits between — DSIR must rank
  // target-vocabulary docs above off-target ones
  private def docs = Seq(
    (0L, "alpha beta gamma alpha beta", 1),
    (1L, "alpha gamma beta gamma", 1),
    (2L, "xray yankee zulu xray", 0),
    (3L, "zulu zulu yankee xray yankee", 0),
    (4L, "alpha beta xray yankee", 0),   // mixed, not in target
    (5L, "", 0)                          // empty text → score 0
  ).toDF("doc_id", "text", "tgt")

  private def toks = split(trim(col("text")), "\\s+")

  test("select ranks target-vocabulary docs above off-target ones") {
    val out = Dsir.select(docs, col("doc_id"),
        when(length(trim(col("text"))) === 0, array().cast("array<string>"))
          .otherwise(toks),
        col("tgt") === 1, buckets = 64, frac = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.size == 6)
    val score = out.view.mapValues(_._1).toMap
    // pure target-vocab docs outscore pure off-target docs
    assert(score(0L) > score(2L) && score(0L) > score(3L))
    assert(score(1L) > score(2L) && score(1L) > score(3L))
    // the mixed doc sits strictly between
    assert(score(4L) < math.max(score(0L), score(1L)))
    assert(score(4L) > math.min(score(2L), score(3L)))
    // empty doc scores exactly 0
    assert(score(5L) == 0.0)
    // frac=0.5 of 6 docs → exactly 3 selected, and they are the top 3
    val sel = out.filter(_._2._2 == 1L).keySet
    assert(sel.size == 3)
    val top3 = out.toSeq.sortBy { case (id, (s, _)) => (-s, id) }.take(3).map(_._1).toSet
    assert(sel == top3)
  }

  test("hashedLogRatios are finite and bounded by smoothing") {
    val lr = Dsir.hashedLogRatios(docs, toks, col("tgt") === 1, buckets = 32)
    assert(lr.length == 32)
    assert(lr.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("select is deterministic across runs") {
    def run() = Dsir.select(docs, col("doc_id"), toks, col("tgt") === 1,
      buckets = 64, frac = 0.5).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
