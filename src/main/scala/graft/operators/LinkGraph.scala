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
}
