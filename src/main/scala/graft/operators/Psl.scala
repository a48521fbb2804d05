package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public Suffix List (PSL) rules + matcher for [[Urls.registeredDomain]].
  *
  * The PSL (publicsuffix.org — public data, Mozilla-maintained) is the
  * list every browser and crawler uses to decide where the "registered
  * domain" boundary sits: `example.co.uk`'s owner-controlled label is
  * `example`, not `co`, because `co.uk` is a public suffix. The matching
  * algorithm (from the published spec at publicsuffix.org/list/):
  *
  *   1. a rule matches a host when the rule's labels are a suffix of the
  *      host's labels (a `*` label matches exactly one host label);
  *   2. if any EXCEPTION rule (`!`-prefixed) matches, it prevails and
  *      its public suffix is the rule minus its leftmost label;
  *   3. otherwise the matching rule with the MOST labels prevails;
  *   4. if nothing matches, the implicit default rule `*` applies
  *      (every bare TLD is a public suffix);
  *   5. registered domain = public suffix plus one more host label.
  *
  * The embedded table is a ~450-entry slice of the ICANN section chosen
  * to cover the TLD mass a web crawl actually sees: the full second-level
  * registries of uk/jp/au/br/in/cn/nz/za/kr/tw/tr/ua/ru/pl/id/il/th/sg/
  * hk/my/ph/vn/sa/eg/ng/ke/mx/ar/cl/pe/ve/uy/ec/co/fr/es/pt/gr/ro/it/ca,
  * the 47 Japanese prefecture suffixes, the US state + k12/cc/lib
  * hierarchy (depth-4 rules included), every all-label wildcard TLD
  * (`*.ck`-family), the Japanese designated-city wildcards with their
  * `!city.*` exceptions, and `*.sch.uk`. Swapping in the complete PSL is
  * a data change only: regenerate these Seqs from the published file
  * (same grouping by label depth) — the matcher below is depth-generic
  * up to the list's maximum rule length.
  *
  * Scale: the rule sets compile to Catalyst `InSet` hash lookups inside
  * whole-stage codegen (no UDF, no join), so [[publicSuffixLen]] runs at
  * scan speed on 100 TB of URLs. A full-PSL swap (~10k rules) still fits
  * `InSet` comfortably; only a customer-supplied multi-million-entry
  * private section would warrant the broadcast-join variant.
  *
  * Convention (documented divergence from the spec): when the host IS a
  * public suffix (`co.uk` itself, or `example.ck` under `*.ck`), the
  * spec says "no registrable part"; a curation pipeline still needs a
  * non-null group key, so [[Urls.registeredDomain]] returns the whole
  * host in that case.
  *
  * Reference behavior: `/root/reference` curates by exact string keys
  * only (document text dedup, pool ids — e.g. `bdqa/dedup.py:31`); the
  * domain layer is part of this repo's LLM-data-pipeline extension
  * surface and follows the public PSL spec instead.
  */
object Psl {

  /** US states + DC + territories with `<st>.us` delegations (PSL us section). */
  private val UsStates: Seq[String] = Seq(
    "ak", "al", "ar", "as", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "gu", "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm", "nv",
    "ny", "oh", "ok", "or", "pa", "pr", "ri", "sc", "sd", "tn", "tx", "ut",
    "va", "vi", "vt", "wa", "wi", "wv", "wy")

  /** The 50 states + DC carry `k12.<st>.us` / `cc.<st>.us` / `lib.<st>.us`
    * school-hierarchy suffixes (the PSL's us section; the four island
    * territories as/gu/pr/vi do not). */
  private val UsK12States: Seq[String] = UsStates.filterNot(
    Set("as", "gu", "pr", "vi"))

  /** The 47 Japanese prefecture suffixes (`<pref>.jp`, PSL jp section). */
  private val JpPrefectures: Seq[String] = Seq(
    "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
    "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
    "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
    "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki", "nagano",
    "nagasaki", "nara", "niigata", "oita", "okayama", "okinawa", "osaka",
    "saga", "saitama", "shiga", "shimane", "shizuoka", "tochigi",
    "tokushima", "tokyo", "tottori", "toyama", "wakayama", "yamagata",
    "yamaguchi", "yamanashi")

  /** Exact 2-label rules (`co.uk`-class), grouped per ccTLD registry. */
  val exact2: Seq[String] = (
    // uk (sch.uk is a wildcard base, see wild2)
    Seq("ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
      "org.uk", "plc.uk", "police.uk") ++
    // jp organizational + prefectures
    Seq("ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
      "ne.jp", "or.jp") ++ JpPrefectures.map(_ + ".jp") ++
    // au
    Seq("com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
      "id.au") ++
    // br
    Seq("com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
      "art.br", "adv.br", "eco.br", "emp.br", "eng.br") ++
    // in
    Seq("co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
      "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in") ++
    // cn
    Seq("ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
      "mil.cn") ++
    // nz
    Seq("ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
      "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
      "org.nz", "parliament.nz", "school.nz") ++
    // za
    Seq("ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za",
      "net.za", "nom.za", "org.za", "school.za", "web.za") ++
    // kr
    Seq("co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
      "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
      "busan.kr") ++
    // tw
    Seq("com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw",
      "idv.tw", "game.tw", "ebiz.tw", "club.tw") ++
    // tr
    Seq("com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
      "av.tr", "biz.tr", "gen.tr", "web.tr", "info.tr", "tv.tr") ++
    // ua
    Seq("com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
      "kiev.ua", "lviv.ua", "od.ua", "dp.ua", "kh.ua") ++
    // ru (ICANN section)
    Seq("ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru") ++
    // pl
    Seq("com.pl", "net.pl", "org.pl", "edu.pl", "info.pl", "waw.pl",
      "wroc.pl", "krakow.pl", "poznan.pl", "gda.pl") ++
    // id
    Seq("ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id",
      "my.id", "net.id", "or.id", "sch.id", "web.id") ++
    // il
    Seq("ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
      "net.il", "org.il") ++
    // th
    Seq("ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th") ++
    // sg
    Seq("com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg") ++
    // hk
    Seq("com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk") ++
    // my
    Seq("com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
      "name.my") ++
    // ph
    Seq("com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
      "mil.ph", "i.ph") ++
    // vn
    Seq("com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
      "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn") ++
    // sa
    Seq("com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
      "edu.sa", "sch.sa") ++
    // eg
    Seq("com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
      "net.eg", "org.eg", "sci.eg") ++
    // ng
    Seq("com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
      "name.ng", "net.ng", "org.ng", "sch.ng") ++
    // ke
    Seq("ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke",
      "ne.ke", "or.ke", "sc.ke") ++
    // mx / ar / cl / pe / ve / uy / ec / co (LatAm)
    Seq("com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx") ++
    Seq("com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
      "net.ar", "org.ar") ++
    Seq("gob.cl", "gov.cl", "mil.cl") ++
    Seq("com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
      "org.pe") ++
    Seq("com.ve", "edu.ve", "gob.ve", "mil.ve", "net.ve", "org.ve",
      "info.ve", "int.ve", "web.ve") ++
    Seq("com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy") ++
    Seq("com.ec", "info.ec", "net.ec", "fin.ec", "k12.ec", "med.ec",
      "pro.ec", "org.ec", "gob.ec", "gov.ec", "mil.ec") ++
    Seq("com.co", "edu.co", "gov.co", "info.co", "int.co", "mil.co",
      "net.co", "nom.co", "org.co", "rec.co", "web.co") ++
    // fr / es / pt / gr / ro / it (European registries with SLDs)
    Seq("asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr") ++
    Seq("com.es", "nom.es", "org.es", "gob.es", "edu.es") ++
    Seq("com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
      "org.pt", "publ.pt") ++
    Seq("com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr") ++
    Seq("arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro",
      "org.ro", "rec.ro", "store.ro", "tm.ro", "www.ro") ++
    Seq("gov.it", "edu.it") ++
    // ca provinces + federal
    Seq("ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
      "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
      "gc.ca") ++
    // us: states + federal special-purpose
    UsStates.map(_ + ".us") ++
    Seq("fed.us", "isa.us", "nsn.us", "dni.us", "kids.us")
  ).distinct

  /** Exact 3-label rules — the US school hierarchy (`k12.ca.us`-class). */
  val exact3: Seq[String] =
    UsK12States.flatMap(st => Seq(s"k12.$st.us", s"cc.$st.us", s"lib.$st.us"))

  /** Exact 4-label rules — Massachusetts' chartered/private/parochial
    * school sub-hierarchy (the deepest exact rules in the ICANN section). */
  val exact4: Seq[String] =
    Seq("pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us")

  /** 1-label wildcard bases: the `*.<tld>` rules where EVERY second-level
    * name is itself a public suffix. */
  val wild1: Seq[String] = Seq("bd", "ck", "er", "fk", "jm", "kh", "mm",
    "np")

  /** 2-label wildcard bases: Japanese designated-city geographics
    * (`*.kawasaki.jp`-class) and the UK schools tree (`*.sch.uk`). */
  val wild2: Seq[String] = Seq("kawasaki.jp", "kitakyushu.jp", "kobe.jp",
    "nagoya.jp", "sapporo.jp", "sendai.jp", "yokohama.jp", "sch.uk")

  /** 2-label exception rules (the rule text after `!`): `!www.ck`. */
  val exc2: Seq[String] = Seq("www.ck")

  /** 3-label exception rules: the cities themselves are registrable
    * (`!city.kawasaki.jp`-class). */
  val exc3: Seq[String] = Seq("city.kawasaki.jp", "city.kitakyushu.jp",
    "city.kobe.jp", "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  /** Number of labels in the public suffix of a host split into `labels`
    * (size `n`), per the PSL algorithm in the class doc. Exceptions are
    * checked first (they prevail over any other match); then matches from
    * longest to shortest (a wildcard with a k-label base matches k+1
    * labels); the implicit `*` default rule yields 1. Pure `when`/`InSet`
    * chain — whole-stage codegen, no UDF. */
  def publicSuffixLen(labels: Column, n: Column): Column = {
    val s1 = element_at(labels, -1)
    val s2 = concat_ws(".", element_at(labels, -2), s1)
    val s3 = concat_ws(".", element_at(labels, -3), s2)
    val s4 = concat_ws(".", element_at(labels, -4), s3)
    when(n >= 3 && s3.isin(exc3: _*), lit(2))
      .when(n >= 2 && s2.isin(exc2: _*), lit(1))
      .when(n >= 4 && s4.isin(exact4: _*), lit(4))
      .when(n >= 3 && (s3.isin(exact3: _*) || s2.isin(wild2: _*)), lit(3))
      .when(n >= 2 && (s2.isin(exact2: _*) || s1.isin(wild1: _*)), lit(2))
      .otherwise(lit(1))
  }
}
