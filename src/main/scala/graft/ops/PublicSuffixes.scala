package graft.ops

/** Pinned snapshot of the Public Suffix List (publicsuffix.org — public
  * data) for registered-domain extraction, replacing the former
  * two-label stand-in that merged every `.co.uk` site into one
  * "domain" for per-domain accounting.
  *
  * This is a CURATED SUBSET of the full list (the full file is ~9k
  * rules; this snapshot carries the high-traffic country-code and
  * private-registry suffixes plus every rule *shape* the list uses —
  * plain rules up to four labels, wildcard rules, exception rules).
  * Swapping in the complete list is a data change, not a code change:
  * the lookup below is suffix-set membership, and the sets are plain
  * `Seq[String]` constants. The snapshot is frozen in-source so the
  * operator stays exactly replayable — the DuckDB oracle replays the
  * same generator arithmetic against the same snapshot semantics.
  *
  * PSL semantics implemented by [[Urls.registeredDomain]]:
  *  - among matching rules, an EXCEPTION rule prevails; otherwise the
  *    rule with the most labels wins; no match → last label (`*`).
  *  - a wildcard rule `*.base` makes `<any-label>.base` a public
  *    suffix; an exception `!x.base` carves `x.base` back out (its
  *    public suffix is `base`, so `x.base` is registrable).
  *  - registered domain = public suffix plus one more label; a host
  *    that IS a public suffix has no registrable part and degrades to
  *    the host itself (documented, tested).
  */
object PublicSuffixes {

  /** Plain multi-label rules, grouped by label count (single-label TLDs
    * are the implicit default rule `*` and need no listing). */
  val plain2: Seq[String] = Seq(
    // uk
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // au
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // jp (plain second-level; city wildcards live in `wildcard`)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // nz
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz", "gen.nz",
    "school.nz",
    // br
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    // cn
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // in
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "gov.in",
    "ac.in", "edu.in", "res.in",
    // za
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    // mx / ar
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    // sg / hk / tw / kr
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    // tr / ua / pl / il
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "k12.il",
    // my / ph / vn / eg / sa / ng / ke / id / th
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "sch.sa",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "co.id", "or.id", "web.id", "my.id", "biz.id", "ac.id", "sch.id",
    "go.id", "mil.id", "net.id",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    // us states (two-label public suffixes)
    "ca.us", "ny.us", "tx.us", "ma.us", "wa.us", "fl.us", "ak.us",
    // PRIVATE section (registry-operated suffixes, same mechanics)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "netlify.app", "pages.dev", "web.app",
    "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "vercel.app")

  val plain3: Seq[String] = Seq(
    // us K-12 / community-college per state
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.ma.us", "k12.wa.us",
    "k12.fl.us", "k12.ak.us", "cc.ca.us", "cc.ny.us", "lib.ca.us",
    // private-section three-label suffixes
    "s3.amazonaws.com", "elb.amazonaws.com")

  val plain4: Seq[String] = Seq(
    // the PSL's deepest plain shape: private K-12 per state
    "pvt.k12.ma.us", "pvt.k12.ca.us", "pvt.k12.ny.us",
    // private-section four-label suffixes (regional compute)
    "us-east-1.elb.amazonaws.com", "eu-west-1.elb.amazonaws.com")

  /** Wildcard rule BASES: `*.base` — any single label under the base is
    * itself a public suffix. */
  val wildcard1: Seq[String] = Seq("bd", "ck", "er", "fk", "kh", "mm", "np")

  val wildcard2: Seq[String] = Seq(
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp", "sapporo.jp",
    "sendai.jp", "yokohama.jp",
    // *.sch.uk: schools are <school>.<la>.sch.uk, so the LA label is
    // itself a public suffix (the list's rule is a wildcard, not plain)
    "sch.uk")

  /** Exception rules (stored without the leading `!`): the named host
    * is carved OUT of its wildcard — its public suffix is the rule
    * minus the leading label, so the rule itself is registrable. */
  val exception2: Seq[String] = Seq("www.ck")

  val exception3: Seq[String] = Seq(
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")
}
