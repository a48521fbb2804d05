package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat"),
    (2L, "zebra")
  ).toDF("doc_id", "text")

  test("build ranks tokens by count with deterministic alphabetic ties") {
    val v = Vocab.build(docs, col("text"), size = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // counts: the=3, sat=2, then {cat, dog, mat, on, zebra}=1 (alpha ties)
    assert(v == Map("the" -> 0L, "sat" -> 1L, "cat" -> 2L, "dog" -> 3L))
  }

  test("encode produces closed-form digests with UNK = vocab size") {
    val v = Vocab.build(docs, col("text"), size = 4)
    val out = Vocab.encode(docs, col("doc_id"), col("text"), v, vocabSize = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // doc 0: the(0) cat(2) sat(1) on(UNK=4) the(0) mat(UNK=4)
    assert(out(0L) == ((6L, 2L, 0L + 2 + 1 + 4 + 0 + 4,
      1 * 0L + 2 * 2 + 3 * 1 + 4 * 4 + 5 * 0 + 6 * 4)))
    // doc 1: the(0) dog(3) sat(1)
    assert(out(1L) == ((3L, 0L, 4L, 1 * 0L + 2 * 3 + 3 * 1)))
    // doc 2: zebra(UNK)
    assert(out(2L) == ((1L, 1L, 4L, 4L)))
  }

  test("encode digests are invariant to input partitioning") {
    val many = (0L until 200L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 7} filler$i"))
      .toSeq.toDF("doc_id", "text")
    val v = Vocab.build(many, col("text"), size = 8)
    def run(df: org.apache.spark.sql.DataFrame) =
      Vocab.encode(df, col("doc_id"), col("text"), v, vocabSize = 8)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(many.repartition(13)) == run(many.coalesce(1)))
  }
}
