package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level gating — the first stage of every
  * web-scale corpus run (before any text gate): Common Crawl-style
  * pipelines (e.g. CCNet, RefinedWeb §3.1, FineWeb) dedup and filter
  * at URL/host granularity, and the URL key is only usable after
  * canonicalization (case-folded scheme/host, default ports stripped,
  * fragments dropped, query params ordered).
  *
  * All of it is COMPOSED FROM BUILT-IN string functions — the
  * preference-order rule (compose > custom Expression): every piece
  * (substring_index, split, sort_array, array_join, lower, concat)
  * is codegen'd, so the whole canonicalizer runs inside one
  * WholeStageCodegen span with zero UDF boundary, and the DuckDB
  * oracle replays each step exactly (split_part / list_sort /
  * array_to_string are semantics-identical on this grammar).
  *
  * Grammar handled (documented bounds, not silent wrongness):
  *   scheme://host[:port][/path][?query][#fragment]
  *  - ONE "://" (a literal "://" inside a query value would split
  *    wrong — arbitrarily rare in crawl URLs, and the canonical key
  *    only has to be a deterministic function of the raw URL);
  *  - host:port with a single ':' (bracketed IPv6 hosts are out of
  *    scope — they're absent from crawl URL corpora at any rate that
  *    matters, and would need bracket-aware splitting);
  *  - userinfo ("user:pass@host") is STRIPPED before the host/port
  *    split (text up to the last '@' in the authority): credentials
  *    never identify a distinct resource, and leaving them in would
  *    corrupt both the host and the port parse ('user' as host, the
  *    password as a bogus port);
  *  - scheme-relative URLs ("//host/path") are out of scope: they
  *    only occur UNRESOLVED inside href attributes; crawl URL
  *    corpora store absolute post-resolution URLs;
  *  - percent-encoding is NOT normalized (%7E vs ~): decode-normalize
  *    is a different, lossy operation; canonical keys just need
  *    determinism.
  *
  * Rules (the standard safe-normalization set, RFC 3986 §6.2.2-6.2.3):
  *  - scheme and host lowercased (case-insensitive per RFC);
  *  - fragment stripped (never sent to the server);
  *  - userinfo stripped (credentials never name a distinct resource);
  *  - default port stripped (http:80, https:443);
  *  - query params sorted bytewise (param ORDER is almost always
  *    insignificant; sorting makes ?a=1&b=2 ≡ ?b=2&a=1 — the dedup
  *    win that motivates canonical keys);
  *  - path and query VALUES untouched (case-significant per RFC);
  *  - a trailing empty query ("...?") canonicalizes to no query.
  */
object UrlOps {

  /** Lowercased scheme of `u` (text before "://"). */
  def schemeOf(u: Column): Column =
    lower(substring_index(u, "://", 1))

  private def afterScheme(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    val scheme = substring_index(noFrag, "://", 1)
    noFrag.substr(length(scheme) + lit(4), length(noFrag))
  }

  // authority = text before the first '/' OR '?' (an empty-path URL
  // like http://h.com?a=1 puts the query right after the host), with
  // any userinfo ("user:pass@") stripped: substring_index(-1) takes
  // text after the LAST '@' and is identity when no '@' is present.
  private def authorityOf(rest: Column): Column =
    substring_index(
      substring_index(substring_index(rest, "/", 1), "?", 1), "@", -1)

  // authority INCLUDING userinfo — canonicalizeUrl needs the full
  // span length to find where path+query start in `rest`.
  private def rawAuthorityOf(rest: Column): Column =
    substring_index(substring_index(rest, "/", 1), "?", 1)

  /** Lowercased host of `u` (no port, no path). */
  def hostOf(u: Column): Column =
    lower(substring_index(authorityOf(afterScheme(u)), ":", 1))

  /** Path of `u` (leading '/', no query/fragment; '' when absent) —
    * case-preserved per the canonicalization rule set.
    */
  def pathOf(u: Column): Column = {
    val rest = afterScheme(u)
    val pathq = rest.substr(length(rawAuthorityOf(rest)) + lit(1), length(rest))
    substring_index(pathq, "?", 1)
  }

  /** The canonical URL key — see the object doc for the rule set. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = afterScheme(u)
    val hostport = authorityOf(rest)
    val pathq =
      rest.substr(length(rawAuthorityOf(rest)) + lit(1), length(rest))
    val host = lower(substring_index(hostport, ":", 1))
    val port = when(instr(hostport, ":") > 0,
      substring_index(hostport, ":", -1)).otherwise(lit(""))
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port =!= "" && !defaultPort,
      concat(lit(":"), port)).otherwise(lit(""))
    val path = substring_index(pathq, "?", 1)
    val q = when(instr(pathq, "?") > 0,
      pathq.substr(length(path) + lit(2), length(pathq))).otherwise(lit(""))
    val qPart = when(q =!= "",
      concat(lit("?"), array_join(sort_array(split(q, "&")), "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, path, qPart)
  }

  /** Robots-style host deny gate: true when `host` (already
    * canonical-lowercase) is one of `exact` or is `suffix` itself /
    * any subdomain of a `suffixes` entry ("spam.com" blocks both
    * "spam.com" and "cdn.spam.com"). Literal-folded expression — the
    * right shape for the fixed deny lists ops teams actually ship
    * (thousands of entries still fold fine); a MILLION-entry list
    * would instead broadcast-join a blocklist relation on host, same
    * plan shape as q_blocklist's term gate.
    */
  def isBlockedHost(host: Column, exact: Seq[String],
      suffixes: Seq[String]): Column = {
    val exactHit =
      if (exact.isEmpty) lit(false) else host.isInCollection(exact)
    val sfxHit = suffixes.foldLeft(lit(false)) { (acc, s) =>
      acc || host === s || host.endsWith("." + s)
    }
    exactHit || sfxHit
  }
}
