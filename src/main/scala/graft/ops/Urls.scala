package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization
  * pass every crawl-derived training set runs before URL-level dedup
  * and per-domain accounting (the reference has no web-corpus path;
  * this is part of the training-data extension surface).
  *
  * Everything is composed from NATIVE column functions (regexp on the
  * raw string, higher-order `filter` over the split query params) — no
  * UDF, so the whole pass stays a narrow projection: canonicalizing
  * 100 TB of URLs is a scan coefficient, not a join or shuffle.
  *
  * Canonical form (the common crawl-dedup policy, each rule cheap to
  * replay): scheme forced to https (http/https variants of one page are
  * one page for corpus purposes), host lowercased with a leading
  * `www.` and any `:port` stripped, path with trailing slashes
  * stripped, tracking parameters (`utm_*`) dropped while other params
  * keep their order, fragment dropped.
  */
object Urls {

  private def afterScheme(url: Column): Column =
    regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** Public-suffix label count of a pre-split host (the PSL rule
    * engine shared by [[registeredDomain]] and the `www.` strip
    * guard): exception rules prevail, then the LONGEST match among
    * plain and wildcard rules (`greatest` skips the null branches of
    * unmatched depths), then the implicit `*` (last label). All
    * membership tests compile to `InSet` over string literals —
    * native, no UDF. */
  private def publicSuffixLen(labels: Column, n: Column): Column = {
    import PublicSuffixes._
    val exceptionLen =
      when(suffixIn(labels, 3, exception3), lit(2))
        .when(suffixIn(labels, 2, exception2), lit(1))
    val plainLen =
      when(suffixIn(labels, 4, plain4), lit(4))
        .when(suffixIn(labels, 3, plain3), lit(3))
        .when(suffixIn(labels, 2, plain2), lit(2))
    // `*.base` makes <label>.base a public suffix — one deeper than the
    // base, and only when such a label exists
    val wildLen =
      when(suffixIn(labels, 2, wildcard2) && n >= 3, lit(3))
        .when(suffixIn(labels, 1, wildcard1) && n >= 2, lit(2))
    coalesce(exceptionLen, greatest(plainLen, wildLen, lit(1)))
  }

  /** True when the host IS a public suffix under the pinned snapshot —
    * such a name has no registrable part, so e.g. a `www.` strip that
    * would LAND on one must not happen. */
  private def isPublicSuffix(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    publicSuffixLen(labels, n) >= n
  }

  /** Lowercased host with userinfo (`user:pass@`), `www.` prefix and
    * `:port` stripped — userinfo must go FIRST, or `user@host` would
    * corrupt the registered domain and split one page across canonical
    * identities. The `www.` strip is DOUBLY guarded: a lookahead
    * requires two more labels (for `www.ck` — the PSL exception
    * `!www.ck` — or `www.com`, `www` is the domain label itself, and an
    * unconditional strip collapses the site to a bare TLD), and the
    * stripped remainder must not itself be a public suffix — otherwise
    * `www.github.io` or `www.co.uk`, where `www` sits directly on a
    * multi-label suffix and IS the registrable label, would collapse
    * into the suffix bucket, the exact merge the PSL upgrade exists to
    * prevent. */
  def canonicalHost(url: Column): Column = {
    val base =
      regexp_replace(
        lower(regexp_replace(
          regexp_extract(afterScheme(url), "^([^/?#]*)", 1), "^[^/@]*@", "")),
        ":\\d+$", "")
    val stripped = regexp_replace(base, "^www\\.(?=[^.]+\\.)", "")
    when(stripped =!= base && isPublicSuffix(stripped), base)
      .otherwise(stripped)
  }

  /** Path with trailing slashes stripped (query/fragment excluded). */
  def canonicalPath(url: Column): Column =
    regexp_replace(
      regexp_extract(regexp_replace(afterScheme(url), "^[^/?#]*", ""),
        "^([^?#]*)", 1),
      "/+$", "")

  /** Query string with `utm_*` params dropped, order preserved, no
    * leading `?`; empty when nothing survives. The tracking test is a
    * literal-prefix `startsWith`, NOT a SQL LIKE — `_` is LIKE's
    * single-char wildcard, so `like("utm_%")` would also swallow
    * unrelated params named `utm` plus any one character (`utma=`,
    * `utms=`), silently merging distinct canonical URLs. */
  def canonicalQuery(url: Column): Column = {
    val raw = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(raw, "&"), p => !p.startsWith("utm_") && length(p) > 0),
      "&")
    kept
  }

  /** The last `k` labels of the host joined with dots — empty when the
    * host has fewer than `k` labels (negative-start `slice` degrades to
    * an empty array rather than throwing, so this is ANSI-safe with no
    * size guard). */
  private def lastLabels(labels: Column, k: Int): Column =
    array_join(slice(labels, -k, k), ".")

  private def suffixIn(labels: Column, k: Int, rules: Seq[String]): Column =
    if (rules.isEmpty) lit(false)
    else lastLabels(labels, k).isin(rules: _*)

  /** Registered domain under the pinned [[PublicSuffixes]] snapshot —
    * public suffix plus one label, with full PSL rule semantics
    * ([[publicSuffixLen]]). `bbc.co.uk` → `bbc.co.uk` (not the old
    * two-label `co.uk`, which merged every `.co.uk` site into one
    * "domain" for per-domain caps and mixtures); `user.github.io` →
    * `user.github.io`; `a.b.ck` → `a.b.ck` (wildcard `*.ck`);
    * `sub.www.ck` → `www.ck` (exception `!www.ck`).
    *
    * Still one narrow native projection: the membership tests compile
    * to `InSet` over string literals, so canonicalizing 100 TB of URLs
    * stays a scan coefficient — no UDF, no join, no shuffle. A host
    * that IS a public suffix (e.g. `co.uk` itself) has no registrable
    * part and degrades to the host unchanged, as do IP literals. */
  def registeredDomain(url: Column): Column = {
    val host = canonicalHost(url)
    val labels = split(host, "\\.")
    val n = size(labels)
    // IP literals have no registrable domain — a real crawl is full of
    // them, and the label rules would happily call 192.168.0.1's
    // domain "0.1" (or shred a bracketed IPv6). Degrade to the host.
    val isIpLiteral =
      host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$") || host.contains("[")
    val psLen = publicSuffixLen(labels, n)
    when(isIpLiteral, host)
      .when(n > psLen,
        array_join(slice(labels, (psLen + lit(1)) * -1, psLen + lit(1)), "."))
      .otherwise(host)
  }

  /** The full canonical URL. */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(lit("https://"), canonicalHost(url), canonicalPath(url),
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }
}
