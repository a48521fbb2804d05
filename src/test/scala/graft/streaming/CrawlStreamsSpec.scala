package graft.streaming

import graft.SparkSpec
import graft.operators.WarcSources
import org.apache.spark.sql.functions._

/** Gates for the continuous crawl ingest: stream == batch decode parity
  * across micro-batch seams, WET + raw-HTML extraction in one loop,
  * quarantine isolation, and per-batch partition layout. */
class CrawlStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def member(id: Int, rtype: String, body: Array[Byte],
                     ctype: String = "text/plain"): Array[Byte] =
    WarcSources.gzipWrap(WarcSources.recordBytes(rtype,
      s"https://example.com/doc/$id", "2024-05-01T00:00:00Z", ctype,
      s"<urn:uuid:$id>", body))

  test("continuous ingest: stream == batch decode across file arrivals, " +
       "WET text + extracted HTML land together, corrupt members quarantine") {
    val land = java.nio.file.Files.createTempDirectory("graft-crawl-land").toString
    val textDir = java.nio.file.Files.createTempDirectory("graft-crawl-text").toString
    val quarDir = java.nio.file.Files.createTempDirectory("graft-crawl-quar").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-crawl-ckpt").toString

    def drop(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(land, name), bytes)

    // arrival 1: two WET conversion records + one raw HTML response
    val html =
      "<html><head><title>T3</title><script>x=\"</p>\";</script></head>" +
        "<body><p>Fish &amp; chips.</p><div>tail</div></body></html>"
    drop("a.warc.gz",
      member(1, "conversion", "doc one text".getBytes(Utf8)) ++
        member(2, "conversion", "doc two text".getBytes(Utf8)) ++
        member(3, "response", html.getBytes(Utf8), ctype = "text/html"))

    val q = CrawlStreams.foreachBatchCrawlIngest(
      CrawlStreams.readWarcFiles(spark, land),
      textDir, quarDir, checkpointDir = Some(ckpt))
    try {
      q.processAllAvailable()
      // arrival 2 (a later micro-batch): one clean record + one corrupt member
      val bad = member(5, "conversion", "never decodes".getBytes(Utf8)).clone()
      bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x55).toByte
      drop("b.warc.gz",
        member(4, "conversion", "doc four text".getBytes(Utf8)) ++ bad)
      q.processAllAvailable()
    } finally q.stop()

    val text = spark.read.parquet(textDir)
    val got = text.collect().map(r =>
      r.getAs[String]("url") -> (r.getAs[String]("record_type"),
        r.getAs[String]("title"), r.getAs[String]("text"))).toMap
    assert(got.size == 4, s"expected 4 text rows, got ${got.keySet}")
    assert(got("https://example.com/doc/1") == (("conversion", "", "doc one text")))
    assert(got("https://example.com/doc/4") == (("conversion", "", "doc four text")))
    // the raw capture went THROUGH the extractor: title + visible text only
    assert(got("https://example.com/doc/3") ==
      (("response", "T3", "Fish & chips.\ntail")))
    // seams are real micro-batches: the two files landed in different batches
    assert(text.select("batch_id").distinct().count() == 2)
    // corrupt member quarantined with provenance, clean peers unaffected
    val quar = spark.read.parquet(quarDir).filter(col("error").isNotNull)
    assert(quar.count() == 1)
    assert(quar.collect()(0).getAs[String]("file").endsWith("b.warc.gz"))

    // stream == batch parity: the batch reader over the same landing dir
    // yields the same clean conversion set and the same quarantine count
    val batch = WarcSources.readWarc(spark, land)
    assert(batch.filter(col("error").isNotNull).count() == 1)
    val batchConv = batch
      .filter(col("error").isNull && col("record_type") === "conversion")
      .select(col("url"), decode(col("content"), "UTF-8").as("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val streamConv = got.collect { case (u, ("conversion", _, t)) => u -> t }
    assert(streamConv == batchConv, "stream/batch conversion-text mismatch")
  }
}
