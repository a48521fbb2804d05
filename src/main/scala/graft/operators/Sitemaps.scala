package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap protocol support — the DISCOVERY half of crawl politeness,
  * next to [[Robots]]' admission half: robots.txt advertises sitemap
  * locations (`Sitemap:` directives), and sitemap XML files enumerate
  * the URLs a site wants crawled with freshness/priority hints. A
  * curation pipeline reads them for seed lists, recrawl scheduling, and
  * coverage audits (captured vs advertised).
  *
  * From the public sitemaps.org protocol (sitemaps.org/protocol.html):
  *
  *  - a sitemap file is a `<urlset>` of `<url>` entries, each with a
  *    required `<loc>` and optional `<lastmod>`, `<changefreq>`,
  *    `<priority>` (default 0.5);
  *  - a sitemap INDEX file is a `<sitemapindex>` of `<sitemap>` entries
  *    (each a `<loc>` + optional `<lastmod>`) pointing at child
  *    sitemaps;
  *  - loc values are XML-escaped URLs (entity decode required);
  *  - files are capped at 50,000 entries / 50 MB uncompressed — a SPEC
  *    bound, which is why a per-file local parse (one row per file
  *    through a typed flatMap, zero shuffles) is the scale-correct
  *    plan: no file needs split-parallel reading, and a 100 TB corpus
  *    of sitemaps parallelizes across files.
  *
  * Parsing reuses [[WikiXml]]'s forward scanner pieces (`elementBody`,
  * `decodeXml`) — same totality contract: malformed entries quarantine
  * as error rows, the scan never throws. q170 gates the parse AND the
  * [[Robots]] composition (the advertised-URL seed list with per-URL
  * admission verdicts) closed-form.
  */
object Sitemaps {

  /** One parsed entry. `kind`: "url" (urlset entry), "sitemap" (index
    * entry), or "error" (quarantined — `error` says why). `priority`
    * defaults to the spec's 0.5 for url entries that omit it. */
  final case class Entry(idx: Int, kind: String, loc: String,
                         lastmod: String, changefreq: String,
                         priority: Double, error: String)

  /** The `Sitemap:` directives of one robots.txt (RFC 9309 treats them
    * as non-group records: they apply file-wide, any position). */
  def sitemapRefs(robotsTxt: String): Seq[String] = {
    val s = if (robotsTxt == null) "" else robotsTxt
    val out = Seq.newBuilder[String]
    s.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }

  /** True when position `at` in `s` opens a REAL `<name…` tag: the
    * char after the name is a tag boundary ('>', '/', whitespace). */
  private def tagAt(s: String, at: Int, name: String): Boolean =
    s.startsWith(name, at) && {
      val after = at + name.length
      after < s.length && (s.charAt(after) == '>' ||
        s.charAt(after) == '/' || s.charAt(after).isWhitespace)
    }

  /** First REAL occurrences of the two root tags — boundary-checked
    * (so `<urlset` inside text doesn't need a matching name prefix to
    * confuse us) and XML-comment-aware (a leading `<!-- <sitemapindex>
    * -->` comment must not flip a urlset file into index mode).
    * Returns (urlsetPos, sitemapindexPos), -1 for absent. */
  private def findRoots(s: String): (Int, Int) = {
    var i = 0
    var u = -1
    var x = -1
    while (i >= 0 && (u < 0 || x < 0)) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = -1
      else if (s.startsWith("<!--", lt)) {
        val end = s.indexOf("-->", lt + 4)
        i = if (end < 0) -1 else end + 3 // unterminated comment: stop
      } else {
        if (u < 0 && tagAt(s, lt, "<urlset")) u = lt
        if (x < 0 && tagAt(s, lt, "<sitemapindex")) x = lt
        i = lt + 1
      }
    }
    (u, x)
  }

  /** Parse one sitemap (or sitemap-index) payload. Total: never throws;
    * a payload with neither root yields a single error row. */
  def parse(xml: String): Seq[Entry] = {
    val s = if (xml == null) "" else xml
    val (uPos, xPos) = findRoots(s)
    val isIndex = xPos >= 0 && (uPos < 0 || xPos < uPos)
    val blockTag = if (isIndex) "sitemap" else "url"
    val kind = if (isIndex) "sitemap" else "url"
    if (uPos < 0 && xPos < 0)
      return Seq(Entry(0, "error", "", "", "", 0.0, "no sitemap root"))
    val out = Seq.newBuilder[Entry]
    val open = "<" + blockTag
    val closeTag = "</" + blockTag + ">"
    var from = 0
    var idx = 0
    var done = false
    while (!done) {
      // next REAL open tag (boundary-checked: '<url' must not match
      // '<urlset'), then its block body up to the matching close tag
      var at = -1
      var scan = from
      while (at < 0 && !done) {
        val p = s.indexOf(open, scan)
        if (p < 0) done = true
        else {
          val after = p + open.length
          if (after < s.length && (s.charAt(after) == '>' ||
              s.charAt(after) == '/' || s.charAt(after).isWhitespace)) at = p
          else scan = p + 1
        }
      }
      val block =
        if (done) null
        else {
          val gt = s.indexOf('>', at)
          if (gt < 0) { done = true; null }
          else if (s.charAt(gt - 1) == '/') { from = gt + 1; "" }
          else {
            val close = s.indexOf(closeTag, gt + 1)
            if (close < 0) { done = true; null } // truncated tail: stop
            else { from = close + closeTag.length; s.substring(gt + 1, close) }
          }
        }
      if (block != null) {
        val locRaw = WikiXml.elementBody(block, "loc", 0)
        val lastmod = Option(WikiXml.elementBody(block, "lastmod", 0))
          .map(b => WikiXml.decodeXml(b.trim)).getOrElse("")
        val changefreq = Option(WikiXml.elementBody(block, "changefreq", 0))
          .map(b => WikiXml.decodeXml(b.trim)).getOrElse("")
        val prioRaw = WikiXml.elementBody(block, "priority", 0)
        if (locRaw == null || WikiXml.decodeXml(locRaw.trim).isEmpty) {
          out += Entry(idx, "error", "", lastmod, changefreq, 0.0,
            "missing loc")
        } else {
          val loc = WikiXml.decodeXml(locRaw.trim)
          val prio =
            if (prioRaw == null) 0.5 // the spec default
            else try prioRaw.trim.toDouble
                 catch { case _: NumberFormatException => -1.0 }
          if (prio == -1.0)
            out += Entry(idx, "error", loc, lastmod, changefreq, 0.0,
              "bad priority")
          else
            out += Entry(idx, kind, loc, lastmod, changefreq,
              if (isIndex) 0.0 else prio, "")
        }
        idx += 1
      }
    }
    out.result()
  }

  /** Coverage audit — the third sitemap use named in the class doc:
    * what a site ADVERTISES vs what the crawl CAPTURED, the frame a
    * recrawl scheduler and a politeness audit both read. Both sides key
    * on the NORMALIZED URL form ([[Urls.normalizeUrl]] — an advertised
    * clean URL must match its dirty capture), deduplicate (latest
    * declared lastmod wins on the advertised side, earliest fetch on
    * the captured side), and full-outer join once. Output per URL:
    * (url, domain, status 'both'|'advertised_only'|'captured_only',
    * stale) — `stale` = 1 on a captured URL whose declared lastmod
    * (ISO date, string-comparable) postdates its fetch: the site says
    * the content changed since we took it, i.e. recrawl due.
    *
    * 100 TB shape: two map-side-combined key aggregates and one
    * URL-keyed shuffle join; per-domain rollups are one further
    * aggregate on the emitted `domain` column. */
  def coverageAudit(advertised: DataFrame, loc: Column, lastmod: Column,
                    captured: DataFrame, url: Column,
                    fetched: Column): DataFrame = {
    val a = advertised
      .select(Urls.normalizeUrl(loc).as("url"),
        coalesce(lastmod.cast("string"), lit("")).as("lastmod"))
      .groupBy("url").agg(max(col("lastmod")).as("lastmod"))
      .withColumn("__adv", lit(1))
    val c = captured
      .select(Urls.normalizeUrl(url).as("url"),
        coalesce(fetched.cast("string"), lit("")).as("fetched"))
      .groupBy("url").agg(min(col("fetched")).as("fetched"))
      .withColumn("__cap", lit(1))
    a.join(c, Seq("url"), "full_outer")
      .select(col("url"),
        Urls.registeredDomain(col("url")).as("domain"),
        when(col("__adv").isNotNull && col("__cap").isNotNull, lit("both"))
          .when(col("__adv").isNotNull, lit("advertised_only"))
          .otherwise(lit("captured_only")).as("status"),
        when(col("__adv").isNotNull && col("__cap").isNotNull &&
            col("lastmod") =!= "" && col("lastmod") > col("fetched"), 1L)
          .otherwise(0L).as("stale"))
  }

  /** Per-file entries: (doc_id, entry_idx, kind, loc, lastmod,
    * changefreq, priority, error). Typed flatMap — per-row local parse,
    * zero shuffles (see class doc for why the spec's 50k-entry file cap
    * makes this the right parallelism axis). */
  def entries(df: DataFrame, id: Column, xml: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("_1"), xml.cast("string").as("_2"))
      .as[(Long, String)]
      .flatMap { case (d, x) =>
        parse(x).map(e => (d, e.idx.toLong, e.kind, e.loc, e.lastmod,
          e.changefreq, e.priority, e.error))
      }
      .toDF("doc_id", "entry_idx", "kind", "loc", "lastmod",
        "changefreq", "priority", "error")
  }
}
