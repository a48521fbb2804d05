package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CheckpointPolicySpec extends SparkSpec {
  import spark.implicits._

  test("clusters: Reliable policy matches Local bit-for-bit and writes the dir") {
    // chain + separate component + singletons — exercises multiple rounds
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L))
      .toDF("id_a", "id_b")
    val ids = (0L to 7L).toDF("doc_id")
    val local = Dedup.clusters(pairs, ids)
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val reliable = Dedup.clusters(pairs, ids,
        policy = CheckpointPolicy.Reliable(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local, "reliable-mode labels diverged from local mode")
    // the pins really went to reliable storage: the context's checkpoint
    // dir is seeded and holds rdd checkpoint data
    val ckptRoot = new java.io.File(
      new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
    def countFiles(f: java.io.File): Int =
      if (f.isFile) 1 else Option(f.listFiles).map(_.map(countFiles).sum).getOrElse(0)
    assert(countFiles(ckptRoot) > 0, s"no checkpoint files under $ckptRoot")
  }

  test("q44 runs in reliable mode via spark.graft.checkpoint.dir and matches local") {
    val localRows = graft.queries.Queries.q44DedupClusters(spark, sf001)
      .as[(Long, Long)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_q44_").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      val reliableRows = graft.queries.Queries.q44DedupClusters(spark, sf001)
        .as[(Long, Long)].collect().toSeq
      assert(reliableRows == localRows,
        "q44 reliable-mode output diverged from local mode")
    } finally spark.conf.unset("spark.graft.checkpoint.dir")
  }

  test("curate parity across policies on a duplicate-heavy corpus") {
    val base = "repeated words about streams and windows flowing through the " +
      "engine with enough length to clear the gopher word count gate easily " +
      "and some more filler words to be safe for every rule in the set today"
    val docs = Seq(
      (1L, base, "src0"), (2L, base + " extra", "src0"), (3L, base, "src1"),
      (4L, "a completely different document describing broadcast joins and " +
        "partition pruning with plenty of ordinary words spread across the " +
        "sentence so the quality rules keep it in the corpus for the test", "src1"))
      .toDF("doc_id", "text", "source")
    val local = CorpusPipeline.curate(docs, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_cur_").toString
    val reliable = CorpusPipeline.curate(docs, col("doc_id"), col("text"),
        policy = CheckpointPolicy.Reliable(dir))
      .select("doc_id").as[Long].collect().toSet
    assert(reliable == local, "curate reliable-mode keepers diverged")
  }
}
