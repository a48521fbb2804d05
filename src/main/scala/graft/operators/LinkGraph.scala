package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-graph construction — the stage that turns a crawl into the edge
  * list every link-analysis operator consumes ([[LinkAnalysis]]
  * PageRank/TrustRank, [[Urls.domainStats]] domain graphs, anchor-text
  * corpora): per captured page, extract every `<a href>` with its
  * visible anchor text ([[Html.links]] — quote-aware attributes, entity
  * decode, implicit anchor close) and resolve the href against the
  * capture URL ([[Urls.resolveRef]] — RFC 3986 merge with `..`
  * normalization; mailto/javascript/fragment-to-self handled).
  *
  * Scale: per-row local parse + resolution behind a typed map — zero
  * shuffles, scan-bound, output size = edge count. Domain keys attach
  * afterward as pure codegen columns, so a follow-on domain-graph
  * aggregate shuffles fixed-width keys only. q164 gates extraction +
  * resolution closed-form.
  */
object LinkGraph {

  /** Outgoing edges of every page: (doc_id, link_idx, href, resolved,
    * anchor). Non-resolvable hrefs (mailto:, javascript:, empty) emit
    * no row; `link_idx` numbers the EMITTED edges per page in document
    * order. */
  def edges(df: DataFrame, id: Column, baseUrl: Column,
            html: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("_1"), baseUrl.cast("string").as("_2"),
        html.cast("string").as("_3"))
      .as[(Long, String, String)]
      .flatMap { case (d, base, h) =>
        Html.links(h).iterator
          .map(l => (l.href, Urls.resolveRef(base, l.href), l.text))
          .filter(_._2 != null)
          .zipWithIndex
          .map { case ((href, resolved, anchor), i) =>
            (d, i.toLong, href, resolved, anchor)
          }
      }
      .toDF("doc_id", "link_idx", "href", "resolved", "anchor")
  }

  /** Canonical-URL election per page — the crawl-dedup signal a site
    * declares itself (one page served under many URLs names its ONE
    * canonical form): the first `<link rel="canonical">` wins (the
    * browser/search-engine rule for duplicate declarations), else the
    * first `og:url` meta, else the page's own capture URL; the elected
    * href resolves against the capture URL ([[Urls.resolveRef]]) and
    * normalizes ([[Urls.normalizeUrl]]) so dedup keys on the canonical
    * FORM, not the raw string. Unresolvable declared canonicals
    * (mailto:, empty) fall through to the next source.
    *
    * Output: (doc_id, canon_src "canonical"|"og:url"|"self",
    * canonical). Per-row local parse + codegen normalization — zero
    * shuffles; the downstream dedup is one canonical-keyed aggregate.
    * Scale note: this is the CHEAP dedup key — run it before minhash
    * (q28-class) machinery, because a declared canonical collapses
    * mirror URLs without any similarity work at all. */
  def canonicalUrls(df: DataFrame, id: Column, baseUrl: Column,
                    html: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val elected = df.select(id.cast("long").as("_1"),
        baseUrl.cast("string").as("_2"), html.cast("string").as("_3"))
      .as[(Long, String, String)]
      .map { case (d, base, h) =>
        val refs = Html.headRefs(h)
        val canon = refs.collectFirst {
          case Html.HeadRef("canonical", href)
            if Urls.resolveRef(base, href) != null =>
            ("canonical", Urls.resolveRef(base, href))
        }
        val og = refs.collectFirst {
          case Html.HeadRef("og:url", href)
            if Urls.resolveRef(base, href) != null =>
            ("og:url", Urls.resolveRef(base, href))
        }
        val (src, url) = canon.orElse(og).getOrElse(("self", base))
        (d, src, url)
      }
      .toDF("doc_id", "canon_src", "__raw")
    elected.select(col("doc_id"), col("canon_src"),
      Urls.normalizeUrl(col("__raw")).as("canonical"))
  }

  /** Anchor-text corpus: the top-`k` inlink anchor phrases per resolved
    * target, by inlink count — the standard web-corpus retrieval/quality
    * signal (what the rest of the web CALLS a page beats what the page
    * says about itself; anchor aggregation over [[edges]]' output is the
    * classic construction). Output: (target, rank, anchor, cnt) with
    * rank 1..k per target, ties on count toward the lexicographically
    * smaller anchor (deterministic, engine-portable).
    *
    * 100 TB shape: one (target, anchor)-keyed count aggregate (map-side
    * combine — duplicate anchors collapse before the shuffle), then the
    * BOUNDED [[Selection.topKPerGroupTagged]] election: ≤ k (count,
    * anchor) pairs per (map partition, target), no per-target window
    * sort — a mega-inlink page (every crawl has a few) costs the same
    * aggregation state as a two-inlink one. */
  def anchorCorpus(edges: DataFrame, target: Column, anchor: Column,
                   k: Int): DataFrame = {
    val cnt = edges
      .select(target.cast("string").as("target"),
        anchor.cast("string").as("anchor"))
      .filter(col("target").isNotNull)
      .groupBy("target", "anchor").agg(count(lit(1)).as("cnt"))
    Selection.topKPerGroupTagged(cnt, Seq("target"),
        col("cnt").cast("double"), col("anchor"), k)
      .select(col("target"), col("rank"), col("tag").as("anchor"),
        // the election score IS the count (exact in double far past any
        // real inlink count) — no join back needed
        col("score").cast("long").as("cnt"))
  }
}
