package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain curation — the crawl-corpus stages
  * between [[Html]] extraction and the quality filters: a crawl sees the
  * same page under `HTTP://Site.com:80/a?b=2&a=1&utm_source=x#frag` and
  * `http://site.com/a?a=1&b=2`, and curation decisions (URL dedup,
  * per-domain caps, blocklist decontamination) all key on a CANONICAL
  * form and a REGISTERED domain.
  *
  * [[normalizeUrl]] is a pure builtin-expression chain (parse_url +
  * string/array functions — whole-stage codegen, no UDF, scan-speed):
  * scheme and host lowercase, default ports (http:80 / https:443) strip,
  * non-default ports survive, the fragment drops, `utm_*` tracking
  * params drop, surviving query params sort (order-insensitive
  * canonical form), empty path → `/`.
  *
  * [[registeredDomain]] implements the real Public Suffix List
  * algorithm over the embedded ICANN-section slice in [[Psl]] —
  * exception rules prevail, then longest match (wildcard rules match
  * one extra label), then the implicit `*` default; registered domain =
  * public suffix + one label. The rule sets compile to `InSet` hash
  * lookups inside whole-stage codegen, so the lookup is scan-speed with
  * no join; see [[Psl]] for the slice contents and the full-PSL swap
  * path.
  *
  * The curation operators are one aggregate / one filter each:
  * [[domainStats]] (per-domain doc counts + corpus share — the
  * per-domain-cap input), [[decontaminateByDomain]] (blocklist filter on
  * the registered domain — UT1-blocklist-shaped, list inlined as a
  * codegen IN for small lists), and URL-keyed dedup = `dropDuplicates`
  * on the normalized form (exact, no similarity machinery needed once
  * the form is canonical).
  *
  * Scale: everything here is per-row expression work plus at most one
  * domain-keyed aggregate; nothing shuffles text. The q145 oracle
  * re-derives every normalization step with INDEPENDENT string ops
  * (DuckDB has no parse_url), so the two engines cross-check the
  * URL grammar handling, not just each other's bugs.
  */
object Urls {

  /** Lowercased host of `url`. */
  def host(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Canonical URL — see class doc for the exact rules. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val h = host(url)
    val port = regexp_extract(url, "://[^/?#]*:(\\d+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path0 = parse_url(url, lit("PATH"))
    val path = when(path0.isNull || path0 === "", lit("/")).otherwise(path0)
    val q0 = parse_url(url, lit("QUERY"))
    val params = array_sort(filter(split(coalesce(q0, lit("")), "&"),
      p => !p.startsWith("utm_") && p =!= ""))
    val query = array_join(params, "&")
    concat(scheme, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Registered domain of `url`'s host per the PSL algorithm
    * ([[Psl.publicSuffixLen]]): the public suffix plus one host label.
    * When the host has no registrable part (it IS a public suffix, or a
    * bare single label), the whole host is returned — a curation
    * pipeline needs a non-null group key (documented divergence from
    * the spec's "null"). */
  def registeredDomain(url: Column): Column = {
    val labels = split(host(url), "\\.")
    val n = size(labels)
    val regLen = least(Psl.publicSuffixLen(labels, n) + lit(1), n)
    array_join(slice(labels, -regLen, regLen), ".")
  }

  /** Per-domain doc counts + corpus share (6-dp fence) — the input of a
    * per-domain cap policy. One domain-keyed aggregate. */
  def domainStats(df: DataFrame, url: Column): DataFrame = {
    val d = df.select(registeredDomain(url).as("domain"))
    // In-plan scalar (the repo-wide crossJoin(broadcast(agg)) convention):
    // one job instead of a driver-side count() action plus the aggregate.
    val total = d.agg(count(lit(1)).cast("double").as("__total"))
    d.groupBy("domain").agg(count(lit(1)).as("docs"))
      .crossJoin(broadcast(total))
      .select(col("domain"), col("docs"),
        (floor(col("docs").cast("double") / col("__total") * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("share"))
  }

  /** Drop every row whose registered domain is blocklisted (UT1-shaped
    * decontamination). Small lists inline as a codegen IN; for a
    * million-domain production blocklist use a broadcast anti-join on
    * [[registeredDomain]] instead. */
  def decontaminateByDomain(df: DataFrame, url: Column,
                            blocked: Seq[String]): DataFrame =
    df.filter(!registeredDomain(url).isin(blocked: _*))

  /** Resolve an href `ref` against the page URL `base` (RFC 3986 §5
    * reference resolution, the subset a crawler's link extractor needs —
    * plain Scala for use inside the link-extraction typed map, where the
    * `../` merge loop lives more naturally than in column expressions):
    * absolute refs pass through; `//host/...` takes the base scheme;
    * `/rooted` takes scheme+authority; `?query` replaces the base query;
    * fragment-only refs resolve to the base (self-link); relative paths
    * merge against the base directory with `.`/`..` segment
    * normalization; non-hierarchical schemes (`mailto:`, `javascript:`,
    * `data:`) and empty refs return null — not graph edges. A ref is
    * scheme-qualified ONLY when its first `:` precedes any `/`, `?`, `#`
    * AND the prefix matches the RFC 3986 scheme grammar
    * (`ALPHA *(ALPHA / DIGIT / "+" / "-" / ".")`): a colon in the query
    * or first path segment (`watch?t=1:30`, `10:30.html`) is a legal
    * RELATIVE ref and must not be dropped as a bogus scheme. */
  def resolveRef(base: String, ref: String): String = {
    if (ref == null || base == null) return null
    val r = ref.trim
    if (r.isEmpty) return null
    val baseNoFrag = { val h = base.indexOf('#'); if (h < 0) base else base.substring(0, h) }
    if (r.startsWith("#")) return baseNoFrag
    val colon = r.indexOf(':')
    val delim = r.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (colon > 0 && (delim < 0 || colon < delim) &&
        isSchemePrefix(r, colon)) {
      // scheme-qualified: keep http(s), reject non-hierarchical schemes
      val scheme = r.substring(0, colon).toLowerCase
      return if (scheme == "http" || scheme == "https") r else null
    }
    val schemeEnd = baseNoFrag.indexOf("://")
    if (schemeEnd < 0) return null
    val scheme = baseNoFrag.substring(0, schemeEnd)
    if (r.startsWith("//")) return scheme + ":" + r
    val authEnd = {
      val from = schemeEnd + 3
      val i = baseNoFrag.indexWhere(c => c == '/' || c == '?', from)
      if (i < 0) baseNoFrag.length else i
    }
    val root = baseNoFrag.substring(0, authEnd) // scheme://authority
    if (r.startsWith("/")) return root + normalizePath(r)
    val basePathQ = baseNoFrag.substring(authEnd)
    val basePath = { val q = basePathQ.indexOf('?')
      if (q < 0) basePathQ else basePathQ.substring(0, q) }
    if (r.startsWith("?")) return root + (if (basePath.isEmpty) "/" else basePath) + r
    val dir = basePath.lastIndexOf('/') match {
      case -1 => "/"
      case i => basePath.substring(0, i + 1)
    }
    root + normalizePath(dir + r)
  }

  /** Is `r.substring(0, colon)` a valid RFC 3986 scheme
    * (`ALPHA *(ALPHA / DIGIT / "+" / "-" / ".")`)? A ref like
    * `10:30.html` fails this (digit first) and resolves relatively. */
  private def isSchemePrefix(r: String, colon: Int): Boolean = {
    val c0 = r.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < colon) {
      val c = r.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Remove `.` and `..` segments (RFC 3986 §5.2.4; `..` above root is
    * dropped). The path must start with `/`. */
  private def normalizePath(path: String): String = {
    val q = path.indexOf('?')
    val (p, query) = if (q < 0) (path, "") else (path.substring(0, q), path.substring(q))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    p.split("/", -1).foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    val trailingSlash = p.endsWith("/") || p.endsWith("/.") || p.endsWith("/..")
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "") + query
  }

  /** Per-domain document cap — the policy [[domainStats]] feeds (the
    * CCNet/C4 move: a handful of boilerplate-heavy domains otherwise
    * dominate a crawl corpus): keep at most `cap` docs per registered
    * domain, chosen as the cap smallest per-doc md5 uniforms
    * (deterministic, append-stable uniform sample within each domain —
    * the q42/q76/q148 coin device; ties break on smaller doc_id).
    * Output: one row per INPUT doc — (doc_id, domain, kept 1|0) — so the
    * caller decides whether to drop or downweight.
    *
    * 100 TB shape: [[Selection.topKPerGroup]]'s bounded aggregator holds
    * ≤ cap (hash, id) pairs per (map partition, domain) — map-side
    * combine, no per-domain window sort, a mega-domain costs the same
    * state as a tiny one — plus one id-keyed join back (kept side ≤
    * domains × cap rows). */
  def domainCap(df: DataFrame, id: Column, url: Column, cap: Int): DataFrame = {
    require(cap >= 1, s"cap >= 1: $cap")
    val coined = df.select(id.cast("long").as("doc_id"),
      registeredDomain(url).as("domain"),
      conv(substring(md5(concat_ws("|", id.cast("long"), lit("domain-cap"))
        .cast("binary")), 1, 13), 16, 10).cast("long").as("__h"))
    val kept = Selection.topKPerGroup(coined, Seq("domain"),
        -col("__h"), col("doc_id"), cap)
      .select(col("id").as("doc_id"), lit(1L).as("__kept"))
    coined.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("domain"),
        coalesce(col("__kept"), lit(0L)).as("kept"))
  }
}
