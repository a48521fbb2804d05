package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the wikitext cleaner: template nesting, link forms, ref
  * and comment drops, quote-run markup vs real apostrophes, heading and
  * list-line structure, counters, and totality on malformed input. */
class WikiTextSpec extends SparkSpec {
  import spark.implicits._

  private def text(m: String): String = WikiText.clean(m).text

  test("templates drop whole, nesting-aware, counted at the outer level") {
    val c = WikiText.clean("a {{t1|x={{inner|y}} z}} b {{t2}} c")
    assert(c.text == "a b c")
    assert(c.templates == 2)
    // unclosed template consumes to EOF, never throws
    assert(WikiText.clean("a {{never closed").text == "a")
  }

  test("wiki links: target, last-pipe label, drop prefixes") {
    assert(text("[[pipeline]]") == "pipeline")
    assert(text("[[Data processing|processing]]") == "processing")
    assert(text("[[a|b|c]]") == "c")
    val c = WikiText.clean("x [[File:Img.png|thumb|cap]] y [[Category:Z]] z " +
      "[[image:J.jpg]] w [[keep]]")
    assert(c.text == "x y z w keep")
    assert(c.files == 3 && c.links == 1)
  }

  test("external links keep the label; bare ones drop") {
    val c = WikiText.clean("see [http://x.example the site] or [https://y.example]")
    assert(c.text == "see the site or")
    assert(c.extLinks == 2)
  }

  test("refs drop with contents; self-closing refs too; other tags strip") {
    val c = WikiText.clean(
      "a<ref>cite {{tmpl}} stuff</ref>b<ref name=\"n\" />c<br>d<references/>e")
    assert(c.text == "abcde")
    assert(c.refs == 2 && c.templates == 0) // the ref body is opaque
    assert(text("a<!-- hidden [[x]] -->b") == "ab")
  }

  test("quote runs are markup; single apostrophes are text") {
    assert(text("'''bold''' and ''italic'' but it's fine") ==
      "bold and italic but it's fine")
  }

  test("headings and list markers strip; blank lines drop; lines collapse") {
    assert(text("== Over  view ==\n* item one\n## nested\n\n:indent\n; term") ==
      "Over view\nitem one\nnested\nindent\nterm")
    assert(text("") == "")
    assert(WikiText.clean(null).text == "")
  }

  test("cleanPages: typed-map surface with counters") {
    val df = Seq((1L, "{{i}}\n== H ==\n[[a|b]] x [http://e.x l]<ref>c</ref>"))
      .toDF("doc_id", "m")
    val got = WikiText.cleanPages(df, col("doc_id"), col("m")).collect()(0)
    assert(got.getString(1) == "H\nb x l")
    assert((got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5),
      got.getLong(6)) == ((1L, 1L, 1L, 0L, 1L)))
  }
}
