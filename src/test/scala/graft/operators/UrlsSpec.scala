package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for URL canonicalization + domain curation. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(Tuple1(u)).toDF("u")
      .select(Urls.normalizeUrl(col("u"))).collect()(0).getString(0)

  private def dom(u: String): String =
    Seq(Tuple1(u)).toDF("u")
      .select(Urls.registeredDomain(col("u"))).collect()(0).getString(0)

  test("normalizeUrl: case, default ports, fragments, tracking params, sort") {
    assert(norm("HTTP://News.Example.COM:80/a?utm_source=x&b=2&a=1#frag")
      == "http://news.example.com/a?a=1&b=2")
    assert(norm("https://Site.com:443/p") == "https://site.com/p")
    // non-default ports survive
    assert(norm("http://h.com:8080/x") == "http://h.com:8080/x")
    // empty path -> '/', all-tracking query -> no '?'
    assert(norm("https://h.com?utm_campaign=z") == "https://h.com/")
    assert(norm("http://h.com") == "http://h.com/")
    // already-canonical input is a fixed point
    assert(norm("http://news.example.com/a?a=1&b=2")
      == "http://news.example.com/a?a=1&b=2")
  }

  test("registeredDomain: default rule, exact-2 registries, bare hosts") {
    assert(dom("http://news.example.com/x") == "example.com")
    assert(dom("https://Blog.example.co.uk/y") == "example.co.uk")
    assert(dom("http://a.b.c.site.com") == "site.com")
    assert(dom("http://example.org") == "example.org")
    assert(dom("http://localhost/x") == "localhost")
    // gov.uk-class registry suffix
    assert(dom("https://www.city.gov.uk/x") == "city.gov.uk")
    assert(dom("http://news.example.com.au/") == "example.com.au")
    // jp prefecture suffix
    assert(dom("http://a.b.tokyo.jp") == "b.tokyo.jp")
    // a public suffix itself has no registrable part -> host convention
    assert(dom("http://co.uk/") == "co.uk")
  }

  test("registeredDomain: PSL wildcard rules (*.ck, *.sch.uk, *.nagoya.jp)") {
    // *.ck: every second-level ck name is itself a public suffix
    assert(dom("http://shop.stores.example.ck/y") == "stores.example.ck")
    assert(dom("http://example.ck") == "example.ck") // host IS the suffix
    // *.sch.uk: schools sit one level below their institution suffix
    assert(dom("http://school.bristol.sch.uk") == "school.bristol.sch.uk")
    // *.nagoya.jp designated-city geographic
    assert(dom("http://metro.nagoya.jp") == "metro.nagoya.jp")
    assert(dom("http://www.metro.nagoya.jp/x") == "www.metro.nagoya.jp")
  }

  test("registeredDomain: PSL exception rules beat wildcards") {
    // !www.ck carves www.ck out of *.ck
    assert(dom("http://deep.www.ck/x") == "www.ck")
    assert(dom("http://www.ck/") == "www.ck")
    // !city.nagoya.jp carves the city site out of *.nagoya.jp
    assert(dom("http://www.city.nagoya.jp/x") == "city.nagoya.jp")
  }

  test("registeredDomain: depth-3 and depth-4 exact rules (us hierarchy)") {
    assert(dom("http://district.k12.ca.us/x") == "district.k12.ca.us")
    assert(dom("http://www.district.k12.ca.us/x") == "district.k12.ca.us")
    assert(dom("http://www.pvt.k12.ma.us") == "www.pvt.k12.ma.us")
    assert(dom("http://city.ca.us") == "city.ca.us") // <st>.us exact-2
  }

  test("registeredDomain: full-ICANN entries ABSENT from the former slice") {
    // the fourth depth-4 exact rule (nsw school hierarchy)
    assert(dom("http://x.schools.nsw.edu.au/p") == "x.schools.nsw.edu.au")
    // *.nom.br — the one 2-label wildcard outside jp/uk
    assert(dom("http://site.alice.nom.br/") == "site.alice.nom.br")
    // *.pg — wildcard TLD the slice lacked
    assert(dom("http://shop.example.com.pg") == "example.com.pg")
    // regional SLD newly covered by the full list
    assert(dom("http://visit.aland.fi") == "visit.aland.fi")
    // PRIVATE-section entries (gov.scot, co.technology, *.blogspot.com)
    // are EXCLUDED by design: they classify under the ICANN rules only
    assert(dom("http://www.parliament.gov.scot/x") == "gov.scot")
    assert(dom("http://a.b.co.technology") == "co.technology")
    assert(dom("http://x.ac.gov.br") == "x.ac.gov.br") // depth-3 br
    // IDN rules carry generated punycode twins: the on-the-wire (xn--)
    // host form a crawler actually sees matches 公司.cn's ASCII twin
    assert(dom("http://shop.example.xn--55qx5d.cn/x")
      == "example.xn--55qx5d.cn")
  }

  test("resolveRef: a colon in the query or first path segment is a " +
       "relative ref, not a scheme") {
    val base = "https://site.example/a/b/doc.html"
    assert(Urls.resolveRef(base, "watch?t=1:30")
      == "https://site.example/a/b/watch?t=1:30")
    assert(Urls.resolveRef(base, "?a=b:c")
      == "https://site.example/a/b/doc.html?a=b:c")
    // '10' fails the RFC 3986 scheme grammar (ALPHA first): relative path
    assert(Urls.resolveRef(base, "10:30.html")
      == "https://site.example/a/b/10:30.html")
    // genuine schemes are still recognized (and non-http(s) still drop)
    assert(Urls.resolveRef(base, "mailto:a@b.c") == null)
    assert(Urls.resolveRef(base, "x-proto+v1.2:payload") == null)
    assert(Urls.resolveRef(base, "HTTPS://x.example/p")
      == "HTTPS://x.example/p")
  }

  test("URL dedup: variants of one page collapse on the normalized form") {
    val urls = Seq(
      "HTTP://Site.com:80/a?b=2&a=1",
      "http://site.com/a?a=1&b=2#frag",
      "http://site.com/a?utm_source=x&a=1&b=2",
      "http://site.com/b").toDF("url")
    val distinct = urls.select(Urls.normalizeUrl(col("url")).as("n"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(distinct == Set("http://site.com/a?a=1&b=2", "http://site.com/b"))
  }

  test("domainCap keeps exactly cap docs per domain — the smallest md5 " +
       "coins — and flags every input row") {
    // 30 docs on big.com, 2 on small.org: big capped at 5, small untouched
    val df = ((1L to 30L).map(i => (i, s"http://a.big.com/$i")) ++
      Seq((100L, "http://x.small.org/1"), (101L, "http://y.small.org/2")))
      .toDF("doc_id", "url")
    val got = Urls.domainCap(df, col("doc_id"), col("url"), cap = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got.size == 32, "one verdict row per input doc")
    assert(got.count(_._2 == (("big.com", 1L))) == 5)
    assert(got.count { case (_, (d, _)) => d == "big.com" } == 30)
    assert(got(100L) == (("small.org", 1L)) && got(101L) == (("small.org", 1L)))
    // the kept set is exactly the 5 smallest md5 coins (hand replay)
    def coin(id: Long): String = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s"$id|domain-cap".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    val expect = (1L to 30L).sortBy(i => (coin(i), i)).take(5).toSet
    val keptBig = got.collect {
      case (id, ("big.com", 1L)) => id }.toSet
    assert(keptBig == expect, s"kept $keptBig != coin-smallest $expect")
  }

  test("domainStats + decontaminateByDomain") {
    val df = Seq(
      "http://a.good.com/1", "http://b.good.com/2",
      "http://spam.badsite.com/3", "http://other.org/4").toDF("url")
    val stats = Urls.domainStats(df, col("url"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(stats("good.com") == ((2L, 0.5)))
    assert(stats("badsite.com") == ((1L, 0.25)))
    val kept = Urls.decontaminateByDomain(df, col("url"), Seq("badsite.com"))
      .collect().map(_.getString(0)).toSet
    assert(kept.size == 3 && !kept.exists(_.contains("badsite")))
  }
}
