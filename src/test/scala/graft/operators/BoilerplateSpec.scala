package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import Html.Block

/** Gates for block segmentation + the text-density boilerplate
  * classifier: block boundaries, anchor-char accounting (nesting,
  * cross-block spans, entities), the collapsed-count convention, the
  * rule order (density before word count), and the cleaned-text
  * reassembly. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("blocks: block tags segment, empty blocks drop, counts are collapsed") {
    val got = Html.blocks(
      "<html><body><p> one   two </p><div></div><p>three</p></body></html>")
    assert(got == Seq(Block("one two", 7, 0), Block("three", 5, 0)))
  }

  test("blocks: anchor chars count only <a>-enclosed visible text") {
    val got = Html.blocks(
      """<div><a href="/">Home</a> <a href="/b">About us</a> mid</div>""")
    assert(got == Seq(Block("Home About us mid", 17, 12)))
    // "HomeAbout us" collapsed = 12: runs concatenate without a separator
  }

  test("blocks: anchor nesting and an anchor spanning a block boundary") {
    assert(Html.blocks("<p><a>x<a>y</a>z</a>w</p>") ==
      Seq(Block("xyzw", 4, 3)))
    // the open anchor carries into the next block
    assert(Html.blocks("<p><a>left<p>right</a>tail</p>") ==
      Seq(Block("left", 4, 4), Block("righttail", 9, 5)))
    // stray close tags never drive the depth negative
    assert(Html.blocks("</a><p>plain</p>") == Seq(Block("plain", 5, 0)))
  }

  test("blocks: entities decode inside anchors; title/script content excluded") {
    assert(Html.blocks("<p><a>Fish &amp; Chips</a></p>") ==
      Seq(Block("Fish & Chips", 12, 12)))
    assert(Html.blocks(
      "<head><title>T1</title></head><body><p>seen</p>" +
      "<script>var x = 'hidden';</script></body>") ==
      Seq(Block("seen", 4, 0)))
    assert(Html.blocks("") == Seq.empty)
    assert(Html.blocks(null) == Seq.empty)
  }

  private val page =
    """<div><a href="/">Home</a> <a href="/a">About us</a> <a href="/c">Contact</a></div>
      |<p>This sentence is the real body prose of the page today.</p>
      |<p>Short teaser</p>
      |<p>See our <a href="/promo">promo page</a> for the details of the offer.</p>
      |<div><a href="/t">Terms of service page</a> <a href="/p">Privacy policy notice</a></div>""".stripMargin

  test("classify: density rule fires before the word rule; fenced density") {
    val df = Seq((7L, page)).toDF("doc_id", "html")
    val rows = Boilerplate.classify(
        Boilerplate.blocks(df, col("doc_id"), col("html")))
      .orderBy("block_idx")
      .select("cls", "words", "link_density")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq ==
      Seq("bad", "good", "short", "good", "bad"))
    // the footer link farm has >= 5 words yet reads bad (rule order)
    assert(rows(4)._2 >= 5L)
    // nav density: anchors "HomeAbout usContact" = 19 over "Home About us Contact" = 21
    assert(rows(0)._3 == math.floor(19.0 / 21 * 1e6 + 0.5) / 1e6)
    // inline-anchor prose survives: 10 anchor chars in a 48-char sentence
    assert(rows(3)._1 == "good" && rows(3)._3 == math.floor(10.0 / 48 * 1e6 + 0.5) / 1e6)
  }

  test("cleanText: good blocks rejoin in block order; all-boilerplate docs drop") {
    val df = Seq(
      (1L, page),
      (2L, """<div><a href="/">Only nav</a></div>""")).toDF("doc_id", "html")
    val clean = Boilerplate.cleanText(Boilerplate.classify(
      Boilerplate.blocks(df, col("doc_id"), col("html"))))
    val got = clean.orderBy("doc_id").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L,
      "This sentence is the real body prose of the page today.\n" +
      "See our promo page for the details of the offer.")))
  }
}
