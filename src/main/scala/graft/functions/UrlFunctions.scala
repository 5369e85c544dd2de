package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-key dedup — the cheap pass real
  * corpus pipelines run BEFORE any content dedup: most crawl
  * duplicates are the same resource behind surface-variant URLs
  * (case-insensitive host, default port, #fragment, tracking params,
  * trailing slash).
  *
  * Built entirely from builtin string/regex expressions (codegen'd,
  * no UDF); every pattern is plain-RE2-portable (no lookaround, no
  * backreference REPLACEMENTS — the tracking-param strip works on a
  * '&'-prefixed query string so removals never need to patch the
  * separator). Reference scope note: the reference pipeline routes
  * storage URIs by literal prefix only (`M/main.py` route rules);
  * canonicalization is part of the extended training-data surface. */
object UrlFunctions {

  /** scheme://authority prefix — stops at the first /, ? or #. */
  private val PrefixRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Tracking query params dropped by canonicalization. */
  private val TrackingRe = "&(utm_[A-Za-z0-9_]+|gclid|fbclid|ref)=[^&]*"

  /** Canonical form of `url`:
    *  - fragment removed;
    *  - scheme and authority lowercased (path/query case preserved —
    *    paths are case-sensitive per RFC 3986, hosts are not);
    *  - default port stripped (http:80, https:443);
    *  - tracking params (utm_*, gclid, fbclid, ref) removed, the
    *    '?' dropped too when nothing else remains;
    *  - one trailing slash stripped from the path (root '/' folds to
    *    the bare authority).
    * Param ORDER is preserved (no sort): reordered-param dups are rare
    * in crawls and sorting would cost an array round-trip per row. */
  def canonicalizeUrl(url: Column): Column = {
    val big = lit(1 << 30)
    val noFrag = regexp_replace(url, "#.*", "")
    val prefix = regexp_extract(noFrag, PrefixRe, 0)
    val lp = lower(prefix)
    val lp2 = when(lp.startsWith("http://") && lp.endsWith(":80"),
        lp.substr(lit(1), length(lp) - 3))
      .when(lp.startsWith("https://") && lp.endsWith(":443"),
        lp.substr(lit(1), length(lp) - 4))
      .otherwise(lp)
    val rest = noFrag.substr(length(prefix) + 1, big)
    val path = regexp_extract(rest, "^[^?]*", 0)
    val pth = when(path.endsWith("/"),
      path.substr(lit(1), length(path) - 1)).otherwise(path)
    // '&'-prefix the query so every pair starts with '&', strip
    // tracking pairs wholesale, then drop the leading '&' again
    val rawQ = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val q = regexp_replace(concat(lit("&"), rawQ), TrackingRe, "")
      .substr(lit(2), big)
    concat(lp2, pth,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
