package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-density boilerplate removal — the jusText/trafilatura-style
  * BLOCK classifier that complements [[QualityRules.c4LineFilter]]'s
  * line rules: navigation bars, footer link farms, and copyright
  * stubs are short and link-dense, while body prose is long and
  * link-sparse, so classifying each [[Html.Block]] by link density and
  * word count removes boilerplate the terminal-punctuation rule can't
  * see (a nav line CAN end in a period; body prose NEVER renders as
  * 90% anchor text).
  *
  * jusText-lite rules, in order (the published heuristic's core, minus
  * the context-sensitive relabeling pass — documented simplification):
  *
  *   1. `bad`   — link_density > maxLinkDensity (anchor chars / chars
  *                over the collapsed block text; jusText's 0.33);
  *   2. `short` — fewer than minWords words (too little evidence to
  *                call it prose; jusText quarantines these too);
  *   3. `good`  — everything else; the cleaned document is the good
  *                blocks rejoined in order.
  *
  * Scale: [[Html.blocks]] runs behind the same typed-map boundary as
  * [[Html.extract]] (per-row local parse, zero shuffles), and the
  * classifier is pure codegen'd column arithmetic over the block rows —
  * the whole stage is scan-bound at 100 TB exactly like the extraction
  * it extends. [[cleanText]] is the only shuffle (one doc_id-keyed
  * aggregate) and ships only surviving good-block text.
  *
  * q157 gates blocks + classifier against a closed-form DuckDB replay
  * of a planted six-block page (nav bar, body prose, teaser stub,
  * prose with an inline anchor, copyright stub, footer link farm).
  */
object Boilerplate {

  /** Per-block rows: (doc_id, block_idx, text, chars, anchor_chars) —
    * block_idx counts the document's non-empty blocks in order. */
  def blocks(df: DataFrame, id: Column, html: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("_1"), html.cast("string").as("_2"))
      .as[(Long, String)]
      .flatMap { case (d, h) =>
        Html.blocks(h).zipWithIndex.map { case (b, i) =>
          (d, i.toLong, b.text, b.chars.toLong, b.anchorChars.toLong)
        }
      }
      .toDF("doc_id", "block_idx", "text", "chars", "anchor_chars")
  }

  /** Classify [[blocks]] rows: adds `words`, `link_density` (6-dp
    * fence, the cross-engine convention) and `cls` (`bad`/`short`/
    * `good` — rule order as in the class doc; the density rule is
    * checked FIRST so a link farm with many words still reads `bad`).
    * Pure column arithmetic — no extra pass over the text. */
  def classify(blockRows: DataFrame, minWords: Int = 5,
               maxLinkDensity: Double = 0.33): DataFrame = {
    require(minWords >= 1, s"minWords >= 1: $minWords")
    val ld = floor(col("anchor_chars").cast("double") /
      col("chars").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6)
    val words = size(split(col("text"), "\\s+")).cast("long")
    blockRows
      .withColumn("words", words)
      .withColumn("link_density", ld)
      .withColumn("cls",
        when(col("link_density") > maxLinkDensity, lit("bad"))
          .when(col("words") < minWords, lit("short"))
          .otherwise(lit("good")))
  }

  /** Per-document cleaned text: the `good` blocks of [[classify]]
    * output rejoined in block order with `\n` (docs whose every block
    * was boilerplate drop out). One doc_id-keyed aggregate; the
    * in-aggregate struct sort keeps block order without a window. */
  def cleanText(classified: DataFrame): DataFrame =
    classified.filter(col("cls") === "good")
      .groupBy("doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("block_idx"), col("text")))),
          b => b.getField("text")),
        "\n").as("text_clean"))
}
