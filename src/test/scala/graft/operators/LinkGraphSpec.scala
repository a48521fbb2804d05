package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import Html.Link

/** Gates for web-graph construction: href attribute parsing (quotes,
  * unquoted, decoys), anchor text capture, implicit anchor close, RFC
  * 3986 reference resolution incl. dot-segment merges, and the edge
  * DataFrame surface. */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("links: quoted/unquoted hrefs, entity text, no-href anchors skip") {
    assert(Html.links("""<a href="/x">one</a><a href='/y'>two</a>""") ==
      Seq(Link("/x", "one"), Link("/y", "two")))
    assert(Html.links("<a href=/plain>t</a>") == Seq(Link("/plain", "t")))
    assert(Html.links("""<a name="n">skip</a><a href="/k">keep</a>""") ==
      Seq(Link("/k", "keep")))
    assert(Html.links("""<a href="/e">Fish &amp; Chips</a>""") ==
      Seq(Link("/e", "Fish & Chips")))
    // a data-href decoy must not read as href; quoted '>' stays in value
    assert(Html.links("""<a data-href="/no" href="/yes?q=1>2">t</a>""") ==
      Seq(Link("/yes?q=1>2", "t")))
    // an 'href=' TOKEN inside another attribute's quoted value is part of
    // that value, not a link target (the sequential attribute walk)
    assert(Html.links("""<a title="a href=decoy" href="/real">t</a>""") ==
      Seq(Link("/real", "t")))
    assert(Html.links("""<a title="see href=x here">no link</a>""") ==
      Seq.empty)
    // decoy in a quoted value with the real href BEFORE it
    assert(Html.links("""<a href="/first" alt='href=/ghost'>t</a>""") ==
      Seq(Link("/first", "t")))
    // bare (valueless) href contributes no link; case-insensitive name
    assert(Html.links("""<a href>none</a><a HREF="/up">u</a>""") ==
      Seq(Link("/up", "u")))
  }

  test("links: nested anchor implicitly closes; unclosed trailing anchor emits") {
    assert(Html.links("""<a href="/a">first <a href="/b">second</a>tail""") ==
      Seq(Link("/a", "first"), Link("/b", "second")))
    assert(Html.links("""<p><a href="/u">un closed""") ==
      Seq(Link("/u", "un closed")))
    assert(Html.links("") == Seq.empty && Html.links(null) == Seq.empty)
  }

  test("resolveRef: the RFC 3986 cases") {
    val base = "https://h.example/a/b/doc.html?q=1#frag"
    assert(Urls.resolveRef(base, "https://x.example/p") == "https://x.example/p")
    assert(Urls.resolveRef(base, "//cdn.example/l") == "https://cdn.example/l")
    assert(Urls.resolveRef(base, "/rooted") == "https://h.example/rooted")
    assert(Urls.resolveRef(base, "sub/p") == "https://h.example/a/b/sub/p")
    assert(Urls.resolveRef(base, "../up") == "https://h.example/a/up")
    assert(Urls.resolveRef(base, "../../../over") == "https://h.example/over")
    assert(Urls.resolveRef(base, "./here") == "https://h.example/a/b/here")
    assert(Urls.resolveRef(base, "?x=2") == "https://h.example/a/b/doc.html?x=2")
    assert(Urls.resolveRef(base, "#top") == "https://h.example/a/b/doc.html?q=1")
    assert(Urls.resolveRef("https://h.example", "p") == "https://h.example/p")
    assert(Urls.resolveRef(base, "mailto:a@b.c") == null)
    assert(Urls.resolveRef(base, "javascript:void(0)") == null)
    assert(Urls.resolveRef(base, "") == null)
    assert(Urls.resolveRef(base, "dir/") == "https://h.example/a/b/dir/")
  }

  test("anchorCorpus: top-k anchors per target by count, ties toward the " +
       "lexicographically smaller anchor, bounded aggregation") {
    val edges = Seq(
      // t1: "beta" x3, "alpha" x2, "zeta" x2, "omega" x1 -> top3 =
      // beta(3), alpha(2), zeta(2) (alpha beats zeta on the tie)
      ("https://t1", "beta"), ("https://t1", "beta"), ("https://t1", "beta"),
      ("https://t1", "alpha"), ("https://t1", "alpha"),
      ("https://t1", "zeta"), ("https://t1", "zeta"),
      ("https://t1", "omega"),
      // t2: fewer distinct anchors than k
      ("https://t2", "only"), ("https://t2", "only")
    ).toDF("resolved", "anchor")
    val got = LinkGraph.anchorCorpus(edges, col("resolved"), col("anchor"),
        k = 3)
      .orderBy("target", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      ("https://t1", 1L, "beta", 3L), ("https://t1", 2L, "alpha", 2L),
      ("https://t1", 3L, "zeta", 2L),
      ("https://t2", 1L, "only", 2L)))
  }

  test("headRefs: link rel/href pairs + og:url meta, in order; decoys " +
       "and attribute-less tags contribute nothing") {
    import Html.HeadRef
    val h = """<head><link rel="stylesheet" href="/css/a.css">
      |<link REL="Canonical" href="https://c.example/x">
      |<link rel="alternate">
      |<meta property="og:url" content="https://c.example/og">
      |<meta property="og:title" content="nope">
      |<script>var s = '<link rel="canonical" href="/ghost">';</script>
      |</head>""".stripMargin
    assert(Html.headRefs(h) == Seq(
      HeadRef("stylesheet", "/css/a.css"),
      HeadRef("canonical", "https://c.example/x"),
      HeadRef("og:url", "https://c.example/og")))
    assert(Html.headRefs(null) == Seq.empty)
  }

  test("canonicalUrls: first canonical wins, og:url is the fallback, " +
       "unresolvable canonicals fall through, output is normalized") {
    val df = Seq(
      (1L, "HTTP://Site.Example:80/p/1?b=2&a=1",
        "<link rel=\"canonical\" href=\"/c/1\">" +
          "<link rel=\"canonical\" href=\"/WRONG\">"),
      (2L, "https://site.example/p/2",
        "<meta property=\"og:url\" content=\"https://c.example/og?utm_x=1\">"),
      (3L, "https://site.example/p/3",
        "<link rel=\"canonical\" href=\"mailto:x@y.z\">"),
      (4L, "https://site.example/p/4", "<p>nothing declared</p>")
    ).toDF("doc_id", "u", "h")
    val got = LinkGraph.canonicalUrls(df, col("doc_id"), col("u"), col("h"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "canonical", "http://site.example/c/1"),
      (2L, "og:url", "https://c.example/og"),
      (3L, "self", "https://site.example/p/3"),
      (4L, "self", "https://site.example/p/4")))
  }

  test("edges: per-page dense link_idx, unresolvable hrefs emit nothing") {
    val df = Seq((3L, "https://s.example/a/p.html",
      """<a href="x">one</a><a href="mailto:m@x.y">no</a><a href="/r">two</a>"""))
      .toDF("doc_id", "u", "h")
    val got = LinkGraph.edges(df, col("doc_id"), col("u"), col("h"))
      .orderBy("link_idx")
      .collect().map(r => (r.getLong(1), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, "https://s.example/a/x", "one"),
      (1L, "https://s.example/r", "two")))
  }

  test("incremental link artifact: served == one-shot, folded replay " +
       "no-ops, watermark visible with folded data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-linkart").toString
    // three ingest batches over a small edge universe (sd, dd, tgt, anchor)
    def batch(rows: Seq[(String, String, String, String)]) =
      rows.toDF("sd", "dd", "tgt", "anchor")
    val b0 = batch(Seq(
      ("a.com", "b.com", "https://b.com/p", "Beta"),
      ("a.com", "b.com", "https://b.com/p", "Beta"),
      ("a.com", "a.com", "https://a.com/self", "Self"))) // intra: edge-cut
    val b1 = batch(Seq(
      ("c.com", "b.com", "https://b.com/p", "Beta"),
      ("c.com", "b.com", "https://b.com/p", "Best"),
      ("a.com", "c.com", "https://c.com/q", "Gamma")))
    val b2 = batch(Seq(
      ("b.com", "c.com", "https://c.com/q", "Gamma"),
      ("a.com", "b.com", "https://b.com/p", "Beta")))
    def append(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      LinkGraph.appendLinkBatch(b, col("sd"), col("dd"), col("tgt"),
        col("anchor"), dir, id)
    append(b0, 0); append(b1, 1); append(b2, 2)

    val union = b0.unionByName(b1).unionByName(b2)
    def oneShotEdges = union.filter(col("sd") =!= col("dd"))
      .groupBy(col("sd").as("src"), col("dd").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .as[(String, String, Double)].collect().toSet
    def oneShotAnchors = LinkGraph.anchorCorpus(
        union, col("tgt"), col("anchor"), k = 2)
      .as[(String, Long, String, Long)].collect().toSet
    def servedEdges = LinkGraph.servedDomainEdges(spark, dir)
      .as[(String, String, Double)].collect().toSet
    def servedAnchors = LinkGraph.servedAnchorCorpus(spark, dir, k = 2)
      .as[(String, Long, String, Long)].collect().toSet

    assert(servedEdges == oneShotEdges)
    assert(servedAnchors == oneShotAnchors)
    // intra-domain edge was cut, the self anchor still counted
    assert(!servedEdges.exists { case (s, d, _) => s == d })
    assert(servedAnchors.exists(_._3 == "Self"))

    // compact: same answers, ONE base partition per artifact, watermark
    // visible together with folded data
    LinkGraph.compactLinkArtifacts(spark, dir)
    assert(LinkGraph.foldedWatermark(spark, dir) == 2L)
    assert(servedEdges == oneShotEdges)
    assert(servedAnchors == oneShotAnchors)
    def partitions(sub: String) =
      new java.io.File(s"$dir/$sub").listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(partitions("edges") == Set("batch_id=-1"))
    assert(partitions("anchors") == Set("batch_id=-1"))

    // folded-batch replay MUST no-op: counts unchanged, still one
    // partition, no double-counted weights
    append(b0, 0)
    assert(partitions("edges") == Set("batch_id=-1"))
    assert(servedEdges == oneShotEdges)
    assert(servedAnchors == oneShotAnchors)

    // a genuinely NEW batch past the watermark still appends
    append(batch(Seq(("d.com", "b.com", "https://b.com/p", "Beta"))), 3)
    assert(servedEdges.contains(("d.com", "b.com", 1.0)))
    assert(partitions("edges") == Set("batch_id=-1", "batch_id=3"))

    // per-subdir watermark rides INSIDE each artifact dir (visible
    // together with the folded rows — the ArtifactFold posture, not a
    // root-level side file the swap could decouple from)
    for (sub <- Seq("edges", "anchors"))
      assert(new java.io.File(s"$dir/$sub/_folded_watermark").isFile)
  }

  test("link artifact: fold crash debris (old without live) refuses " +
       "append and fold; rename-back recovers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-linkdbr").toString
    def append(rows: Seq[(String, String, String, String)], id: Long): Unit =
      LinkGraph.appendLinkBatch(rows.toDF("sd", "dd", "tgt", "anchor"),
        col("sd"), col("dd"), col("tgt"), col("anchor"), dir, id)
    append(Seq(("a.com", "b.com", "https://b.com/p", "Beta")), 0)
    LinkGraph.compactLinkArtifacts(spark, dir)
    // simulate a crash between commitFold's two renames: the live edges
    // dir is gone and `edges__fold_old` holds the only copy
    val live = new java.io.File(s"$dir/edges")
    val old = new java.io.File(s"$dir/edges__fold_old")
    assert(live.renameTo(old))
    val eA = intercept[IllegalArgumentException] {
      append(Seq(("c.com", "b.com", "https://b.com/p", "Best")), 1)
    }
    assert(eA.getMessage.contains("crash debris"))
    val eF = intercept[IllegalArgumentException] {
      LinkGraph.compactLinkArtifacts(spark, dir)
    }
    assert(eF.getMessage.contains("crash debris"))
    // SERVING refuses too — an empty frame here would read as "empty
    // graph" and turn into silently-zero rankings downstream
    val eS = intercept[IllegalArgumentException] {
      LinkGraph.servedDomainEdges(spark, dir).collect()
    }
    assert(eS.getMessage.contains("crash debris"))
    // no silent recreation happened — the live dir is still absent
    assert(!live.exists())
    // the documented recovery: rename back, then everything proceeds
    assert(old.renameTo(live))
    append(Seq(("c.com", "b.com", "https://b.com/p", "Best")), 1)
    val served = LinkGraph.servedDomainEdges(spark, dir)
      .as[(String, String, Double)].collect().toSet
    assert(served == Set(("a.com", "b.com", 1.0), ("c.com", "b.com", 1.0)))
  }

  test("link artifact: a legacy root compacted_watermark migrates to " +
       "per-subdir watermarks and folded replays keep no-opping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-linkmig").toString
    def append(rows: Seq[(String, String, String, String)], id: Long): Unit =
      LinkGraph.appendLinkBatch(rows.toDF("sd", "dd", "tgt", "anchor"),
        col("sd"), col("dd"), col("tgt"), col("anchor"), dir, id)
    append(Seq(("a.com", "b.com", "https://b.com/p", "Beta")), 0)
    LinkGraph.compactLinkArtifacts(spark, dir)
    // simulate a pre-upgrade artifact: rows folded into batch_id=-1 but
    // the watermark recorded ONLY as the old root-level file
    for (sub <- Seq("edges", "anchors"))
      assert(new java.io.File(s"$dir/$sub/_folded_watermark").delete())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/compacted_watermark"), "0")
    // a replay of folded batch 0 must STILL no-op: migration carries the
    // legacy value into each subdir before the pending check
    append(Seq(("a.com", "b.com", "https://b.com/p", "Beta")), 0)
    val served = LinkGraph.servedDomainEdges(spark, dir)
      .as[(String, String, Double)].collect().toSet
    assert(served == Set(("a.com", "b.com", 1.0)), "replay double-counted")
    // the legacy file is consumed; the per-subdir convention is in place
    assert(!new java.io.File(s"$dir/compacted_watermark").exists())
    for (sub <- Seq("edges", "anchors"))
      assert(new java.io.File(s"$dir/$sub/_folded_watermark").isFile)
    // post-migration appends and folds proceed normally
    append(Seq(("c.com", "b.com", "https://b.com/p", "Best")), 1)
    LinkGraph.compactLinkArtifacts(spark, dir)
    val after = LinkGraph.servedDomainEdges(spark, dir)
      .as[(String, String, Double)].collect().toSet
    assert(after == Set(("a.com", "b.com", 1.0), ("c.com", "b.com", 1.0)))
  }
}
