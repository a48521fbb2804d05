package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MediaWiki dump XML source — the OTHER giant public corpus format
  * next to WARC ([[WarcSources]]): Wikipedia/Wikidata ship as one
  * multi-TB `<mediawiki>` document of `<page>` elements, and an LLM
  * corpus build ingests it page-parallel.
  *
  * The 100 TB trick is the SPLIT: a dump is a single XML document, so a
  * document parser would be one task. But `</page>` is a sound record
  * delimiter — MediaWiki escapes `<`/`>` inside every text node, so the
  * byte sequence `</page>` cannot occur inside content — which lets
  * Spark's text source with a custom `lineSep` split the dump at
  * arbitrary byte ranges exactly like newline-delimited formats (each
  * executor reads its own range; Hadoop's record reader resolves the
  * straddling record to exactly one owner). Record parallelism is
  * input-sized with NO pre-splitting pass.
  *
  * Each record then holds exactly one `<page>` element (plus, for the
  * first record, the `<siteinfo>` preamble, and for the last, the
  * `</mediawiki>` tail — records without a `<page` open tag drop).
  * Field extraction is a from-scratch forward scanner behind a typed
  * map (the [[Html]]/[[ExactSubstring]] convention: per-row local work,
  * zero shuffles, scan-bound):
  *
  *  - `title`, `ns`, and the FIRST `<id>` after `<page` (the page id —
  *    `<revision>` carries its own later `<id>`, which must not win);
  *  - `<redirect title="…"/>` presence + target (XML-attr decoded);
  *  - the `<text …>` BODY with XML character references decoded
  *    (`amp/lt/gt/quot/apos` + decimal/hex numeric forms) — attributes
  *    on the open tag (`bytes=`, `xml:space=`) are skipped;
  *  - malformed pages (no id / no title) quarantine as `error` rows
  *    rather than killing the scan, the house source convention.
  *
  * q158 gates the whole path by ROUND TRIP: a dump synthesized from the
  * documents table (escaped text, planted entities, redirects, ns
  * variety, multi-file layout) must read back to closed-form fields.
  */
object WikiXml {

  /** One parsed page; `error` non-null ⇒ quarantine row (other fields
    * best-effort). */
  final case class Page(pageId: Long, title: String, ns: Long,
                        redirect: Long, redirectTitle: String,
                        text: String, error: String)

  // ------------------------------------------------------------------
  // scanner
  // ------------------------------------------------------------------

  /** Decode XML character references in `s` (the five predefined
    * entities + numeric forms; undecodable references pass through
    * literally — dumps are machine-written, so this is a defensive
    * path, not a correctness fork). */
  def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi < 0 || semi - i > 12) null
                   else s.substring(i + 1, semi)
        val decoded: String = body match {
          case null => null
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case b if b.startsWith("#") =>
            try {
              val cp = if (b.startsWith("#x") || b.startsWith("#X"))
                         Integer.parseInt(b.substring(2), 16)
                       else Integer.parseInt(b.substring(1))
              if (cp <= 0 || cp > 0x10FFFF) null
              else new String(Character.toChars(cp))
            } catch { case _: Exception => null }
          case _ => null
        }
        if (decoded == null) { out.append(c); i += 1 }
        else { out.append(decoded); i = semi + 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** The body of the first `<tag …>body</tag>` element at/after `from`,
    * raw (undecoded); null if absent. Attribute-tolerant: the open tag
    * ends at the first `>` (dump XML carries no `>` inside attribute
    * values). Self-closing `<tag …/>` yields "". */
  private[operators] def elementBody(s: String, tag: String, from: Int): String = {
    var i = from
    val open = "<" + tag
    while (true) {
      val at = s.indexOf(open, i)
      if (at < 0) return null
      val after = at + open.length
      // require a real tag boundary: '>', whitespace, or '/'
      if (after < s.length && (s.charAt(after) == '>' ||
          s.charAt(after) == ' ' || s.charAt(after) == '/' ||
          s.charAt(after) == '\n' || s.charAt(after) == '\t')) {
        val gt = s.indexOf('>', at)
        if (gt < 0) return null
        if (s.charAt(gt - 1) == '/') return ""
        val close = s.indexOf("</" + tag + ">", gt + 1)
        return if (close < 0) null else s.substring(gt + 1, close)
      }
      i = at + 1
    }
    null // unreachable
  }

  /** Parse one `lineSep=</page>` record into a [[Page]]; returns null
    * for records holding no `<page` element (preamble/tail). */
  def parseRecord(rec: String): Page = {
    val s = if (rec == null) "" else rec
    val at = s.indexOf("<page")
    if (at < 0) return null
    val title = Option(elementBody(s, "title", at)).map(decodeXml).orNull
    val nsStr = elementBody(s, "ns", at)
    val idStr = elementBody(s, "id", at) // first <id> after <page> = page id
    val redirectAt = s.indexOf("<redirect", at)
    val (redirect, redirectTitle) =
      if (redirectAt < 0) (0L, "")
      else {
        val gt = s.indexOf('>', redirectAt)
        val tagStr = if (gt < 0) s.substring(redirectAt)
                     else s.substring(redirectAt, gt + 1)
        val m = "title=\"([^\"]*)\"".r.findFirstMatchIn(tagStr)
        (1L, m.map(x => decodeXml(x.group(1))).getOrElse(""))
      }
    val text = Option(elementBody(s, "text", at)).map(decodeXml).getOrElse("")
    try {
      val pid = if (idStr == null) -1L else idStr.trim.toLong
      val ns = if (nsStr == null) -1L else nsStr.trim.toLong
      val err = if (idStr == null || title == null) "missing id or title"
                else null
      Page(pid, if (title == null) "" else title, ns,
        redirect, redirectTitle, text, err)
    } catch {
      case e: Exception =>
        Page(-1L, if (title == null) "" else title, -1L,
          redirect, redirectTitle, text, s"bad field: ${e.getMessage}")
    }
  }

  // ------------------------------------------------------------------
  // DataFrame surface
  // ------------------------------------------------------------------

  /** Read a dump directory page-parallel: (page_id, title, ns, redirect,
    * redirect_title, text, error). Clean rows have `error` null;
    * malformed pages quarantine with best-effort fields. */
  def readPages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("lineSep", "</page>").text(path)
      .as[String]
      .flatMap(r => Option(parseRecord(r)))
      .toDF("page_id", "title", "ns", "redirect", "redirect_title",
        "text", "error")
  }

  /** Escape a text node for a synthesized dump (the write side of the
    * round-trip gate): `&` `<` `>` — exactly what MediaWiki escapes,
    * and exactly why `</page>` is split-safe. Pure builtins. */
  def escapeXml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
}
