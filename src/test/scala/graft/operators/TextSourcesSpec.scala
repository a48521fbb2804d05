package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TextSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src_").toString

  test("JSONL: nasty strings round-trip, malformed lines quarantine with raw text") {
    val rows = Seq(
      (1L, """quote " backslash \ comma , tab	done"""),
      (2L, "unicode: 你好 éßπ"),
      (3L, null.asInstanceOf[String]),
      (4L, "{looks: like json}"))
    val dir = tmp()
    rows.toDF("id", "s")
      .select(to_json(struct(col("id"), col("s"))).as("value"))
      .unionByName(Seq("not json at all", "{\"id\": 9, \"s\":").toDF("value"))
      .coalesce(1).write.mode("overwrite").text(dir)

    val (clean, bad) = TextSources.quarantineSplit(
      TextSources.readJsonl(spark, dir, schema))
    val got = clean.as[(Long, Option[String])].collect().toMap
    assert(got == rows.map { case (i, s) => i -> Option(s) }.toMap)
    val rawBad = bad.as[String].collect().toSet
    assert(rawBad == Set("not json at all", "{\"id\": 9, \"s\":"))
  }

  test("JSONL: wrong-typed field quarantines the whole line") {
    val dir = tmp()
    Seq("{\"id\": \"not-a-number\", \"s\": \"x\"}", "{\"id\": 5, \"s\": \"ok\"}")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val (clean, bad) = TextSources.quarantineSplit(
      TextSources.readJsonl(spark, dir, schema))
    assert(clean.as[(Long, String)].collect().toSeq == Seq((5L, "ok")))
    assert(bad.count() == 1)
  }

  test("CSV: quoted commas/quotes round-trip; ragged lines quarantine") {
    val dir = tmp()
    val rows = Seq((1L, "a,b"), (2L, "say \"hi\""), (3L, "plain"))
    rows.toDF("id", "s").coalesce(1)
      .write.mode("overwrite").option("header", "false").csv(dir)
    // plant a ragged line alongside the written part files
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "zz_bad.csv"),
      "1,2,3,4,too-many-fields\n".getBytes("UTF-8"))
    val (clean, bad) = TextSources.quarantineSplit(
      TextSources.readCsv(spark, dir, schema))
    assert(clean.as[(Long, String)].collect().toMap == rows.toMap)
    assert(bad.as[String].collect().toSeq == Seq("1,2,3,4,too-many-fields"))
  }

  test("CSV: embedded newlines need multiLine (documented non-splittable path)") {
    val dir = tmp()
    val rows = Seq((1L, "line1\nline2"), (2L, "plain"))
    rows.toDF("id", "s").coalesce(1)
      .write.mode("overwrite").option("header", "false").csv(dir)
    val (clean, _) = TextSources.quarantineSplit(
      TextSources.readCsv(spark, dir, schema, multiLine = true))
    assert(clean.as[(Long, String)].collect().toMap == rows.toMap)
  }
}
