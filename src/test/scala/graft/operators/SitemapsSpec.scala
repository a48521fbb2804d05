package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Sitemaps.Entry

/** Gates for the sitemap protocol parser: urlset/sitemapindex roots,
  * field extraction with entity decode, the spec's priority default,
  * quarantine classes (missing loc, bad priority, no root), robots
  * `Sitemap:` directive extraction, and totality. Pure JVM. */
class SitemapsSpec extends AnyFunSuite {

  test("urlset: full, minimal, and self-closing entries parse in order") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://ex.com/a?x=1&amp;y=2</loc>
        |    <lastmod>2024-03-14</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://ex.com/b</loc></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.parse(xml) == Seq(
      Entry(0, "url", "https://ex.com/a?x=1&y=2", "2024-03-14", "daily",
        0.8, ""),
      Entry(1, "url", "https://ex.com/b", "", "", 0.5, "")))
  }

  test("sitemapindex: child sitemap entries with kind 'sitemap'") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>https://ex.com/m1.xml</loc>
        |    <lastmod>2024-02-02</lastmod></sitemap>
        |  <sitemap><loc>https://ex.com/m2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.parse(xml) == Seq(
      Entry(0, "sitemap", "https://ex.com/m1.xml", "2024-02-02", "", 0.0, ""),
      Entry(1, "sitemap", "https://ex.com/m2.xml", "", "", 0.0, "")))
  }

  test("quarantine: missing loc, bad priority, no root — total, in place") {
    val xml =
      """<urlset>
        |  <url><lastmod>2024-01-01</lastmod></url>
        |  <url><loc>https://ex.com/p</loc><priority>high</priority></url>
        |  <url><loc>https://ex.com/q</loc></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.parse(xml) == Seq(
      Entry(0, "error", "", "2024-01-01", "", 0.0, "missing loc"),
      Entry(1, "error", "https://ex.com/p", "", "", 0.0, "bad priority"),
      Entry(2, "url", "https://ex.com/q", "", "", 0.5, "")))
    assert(Sitemaps.parse("<html>not a sitemap</html>") ==
      Seq(Entry(0, "error", "", "", "", 0.0, "no sitemap root")))
    assert(Sitemaps.parse(null) ==
      Seq(Entry(0, "error", "", "", "", 0.0, "no sitemap root")))
    // truncated trailing block: parsed entries survive, the tail drops
    val trunc = "<urlset><url><loc>https://ex.com/ok</loc></url><url><loc>"
    assert(Sitemaps.parse(trunc) ==
      Seq(Entry(0, "url", "https://ex.com/ok", "", "", 0.5, "")))
  }

  test("root detection: comment-aware and boundary-checked") {
    // a urlset file MENTIONING <sitemapindex in a leading comment must
    // stay a urlset (its <url> entries parse, not drop)
    val commented =
      """<!-- generated; was <sitemapindex> once -->
        |<urlset>
        |  <url><loc>https://ex.com/a</loc></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.parse(commented) ==
      Seq(Entry(0, "url", "https://ex.com/a", "", "", 0.5, "")))
    // boundary check: '<urlsetfoo>' is NOT a urlset root
    assert(Sitemaps.parse("<urlsetfoo><url><loc>x</loc></url></urlsetfoo>")
      == Seq(Entry(0, "error", "", "", "", 0.0, "no sitemap root")))
    // an unterminated comment hides everything after it
    assert(Sitemaps.parse("<!-- <urlset><url><loc>x</loc></url></urlset>")
      == Seq(Entry(0, "error", "", "", "", 0.0, "no sitemap root")))
    // comment between roots: the REAL first root wins
    val both =
      """<!-- <urlset> --><sitemapindex>
        |  <sitemap><loc>https://ex.com/m.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.parse(both) ==
      Seq(Entry(0, "sitemap", "https://ex.com/m.xml", "", "", 0.0, "")))
  }

  test("sitemapRefs: file-wide Sitemap directives, any position, " +
       "case-insensitive, comments stripped") {
    val robots =
      """User-agent: *
        |Disallow: /private/
        |Sitemap: https://ex.com/sitemap.xml  # primary
        |SITEMAP: https://ex.com/news.xml
        |sitemap:
        |""".stripMargin
    assert(Sitemaps.sitemapRefs(robots) ==
      Seq("https://ex.com/sitemap.xml", "https://ex.com/news.xml"))
    assert(Sitemaps.sitemapRefs(null).isEmpty)
  }
}
