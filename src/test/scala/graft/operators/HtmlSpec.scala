package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the HTML → text extractor: tag stripping with quoted-attr
  * awareness, raw-text element skipping, entity decoding, line
  * structure, title capture, and totality on malformed input. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def text(h: String): String = Html.toText(h).text
  private def title(h: String): String = Html.toText(h).title

  test("tags strip; block elements become lines, inline ones vanish") {
    assert(text("<p>one</p><p>two</p>") == "one\ntwo")
    assert(text("a<b>bold</b>c <i>it</i>") == "aboldc it")
    assert(text("<div>x</div><ul><li>i1</li><li>i2</li></ul>") == "x\ni1\ni2")
    assert(text("line<br>break") == "line\nbreak")
    // uppercase tag names
    assert(text("<P>up</P><BR><DIV>down</DIV>") == "up\ndown")
  }

  test("quoted '>' inside attributes does not end the tag") {
    assert(text("""<a href="/x?q=1>2">anchor</a>""") == "anchor")
    assert(text("""<a class='y>z' href="a>b">t</a>""") == "t")
    // unquoted attrs still close at the first '>'
    assert(text("<a href=/plain>t</a>") == "t")
  }

  test("script/style/comment blocks drop WITH their contents") {
    assert(text("""a<script>if(1<2){var x="</div>";}</script>b""") == "ab")
    assert(text("a<style>p>span{color:red}</style>b") == "ab")
    assert(text("a<!-- <p>ghost</p> -->b") == "ab")
    // case-insensitive close tag; attributes on the open tag
    assert(text("""a<SCRIPT type="t">x<y</sCrIpT>b""") == "ab")
    // unclosed raw-text/comment constructs consume to EOF, never throw
    assert(text("a<script>trailing") == "a")
    assert(text("a<!-- never closed") == "a")
  }

  test("character references decode; invalid ones pass through literally") {
    assert(text("<p>Fish &amp; Chips &lt;deal&gt; &quot;q&quot; &apos;a&apos;</p>")
      == "Fish & Chips <deal> \"q\" 'a'")
    assert(text("&#8364;5 and &#x20AC;5") == "€5 and €5")
    // nbsp decodes faithfully to U+00A0 in both forms (it renders as a
    // space but is NOT collapsible whitespace)
    assert(text("a&nbsp;b") == "a\u00A0b")
    assert(text("a&#xA0;b") == "a\u00A0b")
    // invalid: unknown name, unterminated, overlong, bare ampersand
    assert(text("&bogus; &noend x & y &#99999999999;") ==
      "&bogus; &noend x & y &#99999999999;")
  }

  test("whitespace collapses per line; blank lines drop; NBSP survives") {
    assert(text("<p>  a   b  </p>\n\n  <p>\t c </p>") == "a b\nc")
    assert(text("<p>x</p><p>   </p><p>y</p>") == "x\ny")
    // U+00A0 is NOT collapsible whitespace (it renders)
    assert(text("<p>a  b</p>") == "a  b")
  }

  test("title is captured separately from the visible text") {
    val e = Html.toText(
      "<html><head><title> My  Page </title></head><body><p>b</p></body></html>")
    assert(e.title == "My Page")
    assert(e.text == "b")
    assert(title("<p>no title</p>") == "")
  }

  test("total on malformed input — never throws") {
    for (h <- Seq("<", "< >", "<p", "a<b", "&", "&#", "&#x;", "<a href=\"unclosed",
                  "</", "<><><>", null: String, "", "plain text"))
      Html.toText(h) // must not throw
    assert(text("a<b") == "a") // unclosed tag consumes to EOF
    assert(text("plain text") == "plain text")
  }

  test("extract round-trips a synthesized page per row (the q144 shape)") {
    val docs = Seq(
      (1L, "hello world é"), (2L, ""), (3L, "x & y < z")).toDF("doc_id", "t")
    val esc = regexp_replace(regexp_replace(regexp_replace(col("t"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val pages = docs.select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><script>var x=\"</p>\";</script></head><body><p>"),
      esc, lit("</p><div>tail</div></body></html>")).as("html"))
    val got = Html.extract(pages, col("doc_id"), col("html"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L) == ("Doc 1", "hello world é\ntail"))
    assert(got(2L) == ("Doc 2", "tail")) // empty paragraph line drops
    assert(got(3L) == ("Doc 3", "x & y < z\ntail")) // escape round trip
  }
}
