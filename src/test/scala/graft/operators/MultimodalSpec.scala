package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media carries binary payloads with typed metadata") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001))
    val r = media.head()
    assert(r.payload.nonEmpty && r.meta_width == 640)
    assert(Set("image", "audio", "video").contains(r.kind))
  }

  test("stub decode produces deterministic normalized features per partition batch") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001)).limit(50)
    val f1 = Multimodal.decodeFeatures(media, new Multimodal.StubDecoder(16))
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media.repartition(7), new Multimodal.StubDecoder(16))
      .collect().sortBy(_.media_id)
    assert(f1.length == 50)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.checksum == b.checksum)
      assert(a.features.sameElements(b.features), "repartition must not change features")
    }
    // histogram features sum to ~1
    assert(math.abs(f1.head.features.map(_.toDouble).sum - 1.0) < 1e-5)
  }

  test("decoded features feed ANN search") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001)).limit(40)
    val feats = Multimodal.decodeFeatures(media, new Multimodal.StubDecoder(8)).toDF()
    val queries = feats.filter(col("media_id") < 2)
    val nn = Ann.bruteForceTopK(feats, col("media_id"), col("features"),
      queries, col("media_id"), col("features"), k = 3)
    val byQ = nn.select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L))
    assert(byQ.values.forall(_.length == 3))
  }

  test("frame sampling explodes stride-spaced frame indices") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001)).limit(3)
    val frames = Multimodal.sampleFrames(media, nFrames = 10, stride = 3)
    assert(frames.count() == 3 * 4) // indices 0,3,6,9
    assert(frames.filter(col("media_id") === 0).select("frame_idx")
      .as[Int].collect().toSet == Set(0, 3, 6, 9))
  }
}
