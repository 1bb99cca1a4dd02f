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

  /** Lowercased host with userinfo (`user:pass@`), `www.` prefix and
    * `:port` stripped — userinfo must go FIRST, or `user@host` would
    * corrupt the registered domain and split one page across canonical
    * identities. */
  def canonicalHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_replace(
          regexp_extract(afterScheme(url), "^([^/?#]*)", 1), "^[^/@]*@", "")),
        ":\\d+$", ""),
      "^www\\.", "")

  /** Path with trailing slashes stripped (query/fragment excluded). */
  def canonicalPath(url: Column): Column =
    regexp_replace(
      regexp_extract(regexp_replace(afterScheme(url), "^[^/?#]*", ""),
        "^([^?#]*)", 1),
      "/+$", "")

  /** Query string with `utm_*` params dropped, order preserved, no
    * leading `?`; empty when nothing survives. */
  def canonicalQuery(url: Column): Column = {
    val raw = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(raw, "&"), p => !p.like("utm_%") && length(p) > 0), "&")
    kept
  }

  /** Registered domain: the last two labels of the canonical host.
    * (A real crawl pipeline consults the public-suffix list; the
    * two-label rule is the exact-arithmetic stand-in with the same
    * plumbing — still a narrow projection.) */
  def registeredDomain(url: Column): Column = {
    val labels = split(canonicalHost(url), "\\.")
    concat_ws(".", element_at(labels, -2), element_at(labels, -1))
  }

  /** The full canonical URL. */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(lit("https://"), canonicalHost(url), canonicalPath(url),
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }
}
