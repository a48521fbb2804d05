package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import Robots.Rule

/** Gates for the robots.txt stage: RFC 9309 parsing (groups, comments,
  * case, empty values, unknown directives), group selection, the
  * wildcard/anchor matcher, longest-match + allow-wins-tie decisions,
  * and the broadcast DataFrame surface incl. the missing-robots
  * default. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // parser
  // ------------------------------------------------------------------

  test("parse: groups, comments, key case, unknown directives") {
    val rules = Robots.parse(
      """# header comment
        |User-Agent: *
        |Disallow: /a/   # trailing comment
        |ALLOW: /a/pub
        |Crawl-delay: 10
        |Sitemap: https://x/s.xml
        |""".stripMargin)
    assert(rules == Seq(Rule("*", allow = false, "/a/"),
                        Rule("*", allow = true, "/a/pub")))
  }

  test("parse: consecutive user-agent lines head ONE group; a user-agent" +
       " after a rule starts a new group") {
    val rules = Robots.parse(
      """User-agent: alpha
        |User-agent: beta
        |Disallow: /x
        |User-agent: gamma
        |Disallow: /y
        |""".stripMargin)
    assert(rules.toSet == Set(
      Rule("alpha", allow = false, "/x"), Rule("beta", allow = false, "/x"),
      Rule("gamma", allow = false, "/y")))
  }

  test("parse: empty-valued rules are no-ops; rules before any group drop") {
    assert(Robots.parse("Disallow: /orphan\nUser-agent: *\nDisallow:\n")
      .isEmpty)
    // an empty Disallow still counts as "saw a rule" for group splitting
    val rules = Robots.parse(
      "User-agent: a\nDisallow:\nUser-agent: b\nDisallow: /z\n")
    assert(rules == Seq(Rule("b", allow = false, "/z")))
  }

  test("parse is total on junk input") {
    assert(Robots.parse(null).isEmpty)
    assert(Robots.parse("").isEmpty)
    assert(Robots.parse("::::\nno colon line\n:leading\n").isEmpty)
  }

  // ------------------------------------------------------------------
  // group selection
  // ------------------------------------------------------------------

  test("rulesFor: exact agent token (case-insensitive) shadows the star group") {
    val rules = Seq(Rule("GraftBot", allow = false, "/g"),
                    Rule("*", allow = false, "/"))
    assert(Robots.rulesFor(rules, "graftbot") ==
      Seq(Rule("GraftBot", allow = false, "/g")))
    assert(Robots.rulesFor(rules, "otherbot") ==
      Seq(Rule("*", allow = false, "/")))
    assert(Robots.rulesFor(Seq.empty, "x").isEmpty)
  }

  // ------------------------------------------------------------------
  // matcher
  // ------------------------------------------------------------------

  test("matches: start-anchored prefixes, '*' runs, '$' end anchor") {
    assert(Robots.matches("/a/", "/a/1"))
    assert(!Robots.matches("/a/", "/b/a/")) // start-anchored
    assert(Robots.matches("/a/*.pdf", "/a/x/y/doc.pdf"))
    assert(Robots.matches("/a/*.pdf", "/a/doc.pdfx")) // prefix semantics
    assert(!Robots.matches("/a/*.pdf$", "/a/doc.pdfx"))
    assert(Robots.matches("/a/*.pdf$", "/a/x/doc.pdf"))
    assert(Robots.matches("/*?*utm_", "/p?x=1&utm_src=a"))
    assert(Robots.matches("*", "/anything"))
    assert(Robots.matches("/a/*1$", "/a/21?b=2&a=1")) // query participates
    assert(!Robots.matches("/a/*1$", "/a/21?c=z"))
    // greedy earliest middle segments never block a feasible tail
    assert(Robots.matches("/x*ab*ab$", "/xabab"))
    assert(Robots.matches("/x*ab*ab", "/xabzab"))
    assert(!Robots.matches("/x*ab*ab$", "/xab"))
    // consecutive stars collapse; exact match needed without any star
    assert(Robots.matches("/a/**b$", "/a/zzb"))
    assert(Robots.matches("/a$", "/a"))
    assert(!Robots.matches("/a$", "/a/"))
    assert(Robots.matches("", "/whatever"))
  }

  test("matches agrees with an independent regex reference on a " +
       "generated grid (adversarial cross-check)") {
    // reference: quote literal runs, '*' -> '.*', trailing '$' -> '$',
    // prefix semantics via a '.*' tail — a DIFFERENT derivation of the
    // same RFC 9309 matching language than the segment scanner
    def refMatches(pattern: String, target: String): Boolean = {
      if (pattern.isEmpty) return true
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val rx = body.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      val full = "^" + rx + (if (anchored) "$" else ".*")
      java.util.regex.Pattern.compile(full, java.util.regex.Pattern.DOTALL)
        .matcher(target).matches()
    }
    val pieces = Seq("/a", "b", "ab", "/", "?x=1", ".pdf", "", "a")
    val rng = new scala.util.Random(42)
    var checked = 0
    for (_ <- 0 until 4000) {
      val pat = (0 until rng.nextInt(4))
        .map(_ => (if (rng.nextBoolean()) "*" else "") +
          pieces(rng.nextInt(pieces.length)))
        .mkString + (if (rng.nextBoolean()) "$" else "")
      val tgt = "/" + (0 until rng.nextInt(5))
        .map(_ => pieces(rng.nextInt(pieces.length))).mkString
      assert(Robots.matches(pat, tgt) == refMatches(pat, tgt),
        s"pattern=<$pat> target=<$tgt>: scanner=" +
          s"${Robots.matches(pat, tgt)} regex=${refMatches(pat, tgt)}")
      checked += 1
    }
    assert(checked == 4000)
  }

  // ------------------------------------------------------------------
  // decisions
  // ------------------------------------------------------------------

  test("decide: longest match wins; allow wins a length tie; no match allows") {
    val rules = Seq(Rule("*", allow = false, "/a/"),
                    Rule("*", allow = true, "/a/1"),
                    Rule("*", allow = false, "/a/1"))
    assert(Robots.decide(rules, "/a/15") == (true, "/a/1", "allow"))
    assert(Robots.decide(rules, "/a/25") == (false, "/a/", "disallow"))
    assert(Robots.decide(rules, "/b") == (true, "", "none"))
    assert(Robots.decide(Seq.empty, "/a") == (true, "", "none"))
  }

  // ------------------------------------------------------------------
  // DataFrame surface
  // ------------------------------------------------------------------

  private val robots = Seq(
    ("example.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"),
    ("closed.org", "User-agent: graftbot\nDisallow: /\n")
  ).toDF("domain", "robots_txt")

  test("verdicts: per-URL rows; missing robots.txt defaults to allowed") {
    val urls = Seq(
      (1L, "https://www.example.com/private/x"),
      (2L, "https://www.example.com/private/ok/page"),
      (3L, "https://sub.closed.org/any"),
      (4L, "https://norobots.net/whatever")
    ).toDF("doc_id", "url")
    val got = Robots.verdicts(urls, col("doc_id"), col("url"),
        robots, col("domain"), col("robots_txt"), agent = "GraftBot")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      (1L, "example.com", 0L, "/private/", "disallow"),
      (2L, "example.com", 1L, "/private/ok", "allow"),
      (3L, "closed.org", 0L, "/", "disallow"),
      (4L, "norobots.net", 1L, "", "none")))
  }

  test("matchTarget: path defaults to '/', query rides along, fragment drops") {
    val got = Seq(
      "https://h.com", "https://h.com/p?q=1#frag", "https://h.com?q=1"
    ).toDF("url").select(Robots.matchTarget(col("url"))).as[String].collect()
    assert(got.toSeq == Seq("/", "/p?q=1", "/?q=1"))
  }

  test("filterAllowedStreaming: same kept set as filterAllowed, schema" +
       " preserved (the micro-batch-legal form)") {
    val urls = Seq(
      (1L, "https://www.example.com/private/x", "a"),
      (2L, "https://www.example.com/private/ok/page", "b"),
      (3L, "https://sub.closed.org/any", "c"),
      (4L, "https://norobots.net/whatever", "d")
    ).toDF("doc_id", "url", "extra")
    val batch = Robots.filterAllowed(urls, col("doc_id"), col("url"),
        robots, col("domain"), col("robots_txt"), agent = "GraftBot")
      .select("doc_id").as[Long].collect().toSet
    val streamy = Robots.filterAllowedStreaming(urls, col("url"),
      robots, col("domain"), col("robots_txt"), agent = "GraftBot")
    assert(streamy.columns.toSeq == urls.columns.toSeq)
    assert(streamy.select("doc_id").as[Long].collect().toSet == batch)
    assert(batch == Set(2L, 4L))
  }

  test("verdicts is size-aware: above broadcastMaxDomains the forced " +
       "broadcast hint disappears and verdicts are identical") {
    val urls = Seq(
      (1L, "https://www.example.com/private/x"),
      (2L, "https://www.example.com/private/ok/page"),
      (3L, "https://sub.closed.org/any"),
      (4L, "https://norobots.net/whatever")
    ).toDF("doc_id", "url")
    def run(thr: Long) = Robots.verdicts(urls, col("doc_id"), col("url"),
      robots, col("domain"), col("robots_txt"), agent = "GraftBot",
      broadcastMaxDomains = thr)
    val hinted = run(Robots.DefaultBroadcastMaxDomains)
    val large = run(0L) // robots side "too big": plain equi-join, AQE picks
    assert(hinted.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "small robots side keeps the explicit broadcast hint")
    assert(!large.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "large robots side must NOT force a broadcast")
    val key = (df: org.apache.spark.sql.DataFrame) => df.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(key(large) == key(hinted), "identical verdicts on both paths")
  }

  test("urlKey = Urls.host scopes rules per host (RFC 9309 origin " +
       "scoping) instead of per registrable domain") {
    val hostRobots = Seq(
      ("blog.example.com", "User-agent: *\nDisallow: /\n")
    ).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://blog.example.com/post"),
      (2L, "https://shop.example.com/item")
    ).toDF("doc_id", "url")
    val perHost = Robots.verdicts(urls, col("doc_id"), col("url"),
        hostRobots, col("domain"), col("robots_txt"), agent = "GraftBot",
        urlKey = Urls.host)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    // sibling host does NOT inherit blog's rules
    assert(perHost.toSeq == Seq((1L, 0L), (2L, 1L)))
    // the default registered-domain key never even matches the host-grained
    // fixture row (key example.com != blog.example.com): both default-allow
    val perDomain = Robots.verdicts(urls, col("doc_id"), col("url"),
        hostRobots, col("domain"), col("robots_txt"), agent = "GraftBot")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(perDomain.toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("filterAllowedStreaming refuses a robots side over its documented " +
       "driver-collect bound") {
    val urls = Seq((1L, "https://x.com/a")).toDF("doc_id", "url")
    val e = intercept[IllegalArgumentException] {
      Robots.filterAllowedStreaming(urls, col("url"),
        robots, col("domain"), col("robots_txt"), agent = "GraftBot",
        maxDomains = 1L)
    }
    assert(e.getMessage.contains("maxDomains"))
  }

  test("filterAllowed keeps exactly the allowed rows with original columns") {
    val urls = Seq(
      (1L, "https://www.example.com/private/x", "keep-cols"),
      (2L, "https://www.example.com/public", "stay")
    ).toDF("doc_id", "url", "extra")
    val kept = Robots.filterAllowed(urls, col("doc_id"), col("url"),
      robots, col("domain"), col("robots_txt"), agent = "GraftBot")
    assert(kept.columns.toSeq == Seq("doc_id", "url", "extra"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("parseAll/delayFor: group-scoped crawl-delay, precedence, min " +
       "of repeats, invalid skip, group boundary") {
    val txt =
      """User-agent: GraftBot
        |Crawl-delay: 2.5
        |crawl-delay: 4
        |User-agent: Late
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 99
        |""".stripMargin
    val d = Robots.parseAll(txt)
    // a delay line closes agent accumulation: Late starts a NEW group
    // and inherits neither GraftBot's delays nor its membership
    assert(Robots.delayFor(d, "GraftBot") == Some(2.5)) // min(2.5, 4)
    assert(Robots.delayFor(d, "Late") == None)
    assert(Robots.delayFor(d, "OtherBot") == Some(99.0)) // * group
    assert(Robots.delayFor(d, "graftbot") == Some(2.5)) // case-insensitive
    // Late's Disallow still parsed as its own group's rule
    assert(Robots.rulesFor(d.rules, "Late") ==
      Seq(Robots.Rule("Late", false, "/x")))
    // invalid and negative values skip; no groups at all → None
    assert(Robots.delayFor(
      Robots.parseAll("User-agent: *\nCrawl-delay: oops\n"),
      "GraftBot") == None)
    assert(Robots.delayFor(
      Robots.parseAll("User-agent: *\nCrawl-delay: -3\n"),
      "GraftBot") == None)
    assert(Robots.delayFor(Robots.parseAll(""), "GraftBot") == None)
  }

  test("delayFor: an exact group that EMITS nothing (empty Disallow only) " +
       "still shadows the * group's delay") {
    // `Disallow:` with an empty value is "no restriction" (RFC 9309) and
    // emits no rule — but the GROUP exists, so its (absent) delay binds:
    // the agent gets None (caller default), never the * group's 99.
    val txt =
      """User-agent: GraftBot
        |Disallow:
        |
        |User-agent: *
        |Crawl-delay: 99
        |""".stripMargin
    val d = Robots.parseAll(txt)
    assert(d.rules.isEmpty && d.delays == Seq("*" -> 99.0))
    assert(d.agents == Set("graftbot", "*"))
    assert(Robots.delayFor(d, "GraftBot") == None)
    assert(Robots.delayFor(d, "OtherBot") == Some(99.0))
  }

  test("rulesFor(Directives): an exact group that EMITS nothing (empty " +
       "Disallow only) shadows the * group's rules too — allow-all") {
    // same group-selection contract as delayFor, applied to the
    // allow/deny rules: GraftBot's group exists (explicit allow-all via
    // empty Disallow), so the * group's Disallow: / must NOT bind it
    val txt =
      """User-agent: GraftBot
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val d = Robots.parseAll(txt)
    assert(Robots.rulesFor(d, "GraftBot").isEmpty)     // allow-all
    assert(Robots.rulesFor(d, "OtherBot").nonEmpty)    // * binds others
    // the legacy Seq[Rule] overload cannot see empty groups — documented
    assert(Robots.rulesFor(d.rules, "GraftBot").nonEmpty)
    // end-to-end: verdicts grants GraftBot and blocks OtherBot
    val robots = Seq(("ex.com", txt)).toDF("domain", "txt")
    val urls = Seq((1L, "https://ex.com/a")).toDF("id", "url")
    def verdictFor(agent: String): Long =
      Robots.verdicts(urls, col("id"), col("url"), robots,
          col("domain"), col("txt"), agent)
        .select("allowed").as[Long].head()
    assert(verdictFor("GraftBot") == 1L)
    assert(verdictFor("OtherBot") == 0L)
  }

  test("Frontier.schedule: per-domain slots, delay decision, defaults") {
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 10\n"),
      ("b.com", "User-agent: GraftBot\nCrawl-delay: 2.5\n" +
        "User-agent: *\nCrawl-delay: 99\n")
    ).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://a.com/1"), (2L, "https://b.com/2"),
      (3L, "https://a.com/3"), (4L, "https://c.com/4"),
      (5L, "https://b.com/5")
    ).toDF("doc_id", "url")
    val out = Frontier.schedule(urls, col("doc_id"), col("url"),
        robots, col("domain"), col("robots_txt"), agent = "GraftBot",
        defaultDelay = 1.5)
      .as[(Long, String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == (("a.com", 0L, 10.0, 0.0)))
    assert(out(3L) == (("a.com", 1L, 10.0, 10.0)))
    assert(out(2L) == (("b.com", 0L, 2.5, 0.0)))
    assert(out(5L) == (("b.com", 1L, 2.5, 2.5)))
    assert(out(4L) == (("c.com", 0L, 1.5, 0.0))) // no robots → default
  }

  test("Frontier.schedule: duplicate robots rows for one domain collapse " +
       "to one delay row — no URL fan-out, smallest declared delay wins") {
    val robots = Seq(
      // a.com fetched twice with different declarations: min declared (3)
      ("a.com", "User-agent: *\nCrawl-delay: 10\n"),
      ("a.com", "User-agent: *\nCrawl-delay: 3\n"),
      // b.com fetched twice, one silent: the declaring fetch wins
      ("b.com", "User-agent: *\n Disallow: /x\n"),
      ("b.com", "User-agent: *\nCrawl-delay: 7\n"),
      // c.com fetched twice, both silent → caller default
      ("c.com", "User-agent: *\nDisallow: /x\n"),
      ("c.com", "User-agent: *\nDisallow: /y\n")
    ).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://a.com/1"), (2L, "https://a.com/2"),
      (3L, "https://b.com/3"), (4L, "https://c.com/4")
    ).toDF("doc_id", "url")
    val rows = Frontier.schedule(urls, col("doc_id"), col("url"),
        robots, col("domain"), col("robots_txt"), agent = "GraftBot",
        defaultDelay = 1.5)
      .as[(Long, String, Long, Double, Double)].collect()
    assert(rows.length == 4) // one row per URL — the join did not fan out
    val out = rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == (("a.com", 0L, 3.0, 0.0)))
    assert(out(2L) == (("a.com", 1L, 3.0, 3.0)))
    assert(out(3L) == (("b.com", 0L, 7.0, 0.0)))
    assert(out(4L) == (("c.com", 0L, 1.5, 0.0)))
  }
}
