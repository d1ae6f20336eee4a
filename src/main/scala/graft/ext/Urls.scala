package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] URL canonicalization + URL-keyed dedup — the first dedup pass of
  * every web-scale corpus pipeline: two crawls of the same page differ
  * only in scheme case, `www.`, default ports, tracking params, param
  * order, fragments, or trailing slashes, and canonicalizing before
  * comparing collapses them without touching the page text at all.
  *
  * Canonical form produced (documented spec, applied in this order):
  *   1. trim; drop the `#fragment`
  *   2. scheme lowercased (no scheme upgrading: http and https remain
  *      distinct pages)
  *   3. host lowercased; a leading `www.` dropped
  *   4. explicit DEFAULT ports dropped (`:80` for http, `:443` for
  *      https); non-default ports kept
  *   5. path kept case-sensitive (paths are case-significant by RFC);
  *      trailing `/`s dropped
  *   6. query params split on `&`, tracking params removed (default
  *      list `utm_*`, `gclid`, `fbclid`, `msclkid` — parameterizable),
  *      the rest SORTED and rejoined — param order never distinguishes
  *      pages; an emptied query drops its `?`
  *   7. userinfo (`user@host`) is dropped — the canonical key is the
  *      PAGE identity, and credentials in a URL never change which page
  *      is fetched
  *
  * Everything is a pure Column expression over Spark's `parse_url` +
  * array functions — codegen-friendly, no UDF, fully distributed; the
  * dedup is one hash aggregation on the canonical key (partial map-side
  * combine, same scale shape as every keyed dedup in this repo).
  */
object Urls {

  /** Default tracking params to strip: name patterns (regex fragments)
    * matched against the full `name` or `name=value` token.
    *
    * Every entry here trades an over-merge for a dedup hit, so the list
    * holds only params that NEVER select different page content:
    * `utm_*`/`gclid`/`fbclid`/`msclkid` are pure attribution tags by
    * their published contracts. Bare `ref` is deliberately NOT listed —
    * on real sites it is load-bearing (`?ref=<branch>` selects different
    * page content on code-hosting sites), and because the dedup is by
    * KEY, canonicalizing two different pages together silently DELETES
    * one of them with no text-stage backstop. Callers who know their
    * crawl's `ref` is attribution-only can pass a wider list.
    */
  val DefaultTrackingParams: Seq[String] =
    Seq("utm_[^=]*", "gclid", "fbclid", "msclkid")

  private def trackingRegex(params: Seq[String]): String =
    params.mkString("^(", "|", ")(=.*)?$")

  /** Canonicalize a URL column per the spec above. Rows that are not
    * parseable URLs (no `scheme://host`) canonicalize to NULL — callers
    * filter or quarantine them explicitly rather than silently keeping
    * unparseable keys.
    *
    * @param trackingParams name patterns of query params to strip (see
    *        [[DefaultTrackingParams]] for the default and the over-merge
    *        direction an entry buys into)
    */
  def canonicalize(
      url: Column,
      trackingParams: Seq[String] = DefaultTrackingParams): Column = {
    val u = trim(url)
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val host0 = lower(try_parse_url(u, lit("HOST")))
    val host = regexp_replace(host0, "^www\\.", "")
    // parse_url HOST strips the port; recover it from AUTHORITY and keep
    // only non-default ones.
    val port = regexp_extract(try_parse_url(u, lit("AUTHORITY")), ":(\\d+)$", 1)
    val keptPort = when(
      port === "" or
        (scheme === "http" and port === "80") or
        (scheme === "https" and port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val path = regexp_replace(coalesce(try_parse_url(u, lit("PATH")), lit("")),
      "/+$", "")
    val query0 = coalesce(try_parse_url(u, lit("QUERY")), lit(""))
    val kept = filter(split(query0, "&"),
      p => !(p.rlike(trackingRegex(trackingParams))) && p =!= "")
    val query = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(kept), "&")))
    when(scheme.isNull or host0.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, keptPort, path, query))
  }

  /** Keyed keep-first dedup on the canonical URL: one row per canonical
    * key, the smallest `idCol` wins. Output: (url_canon, first id, the
    * duplicate count) — callers semi-join `first` back for full rows.
    */
  def dedupByUrl(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      trackingParams: Seq[String] = DefaultTrackingParams): DataFrame =
    df.select(canonicalize(col(urlCol), trackingParams).as("url_canon"),
        col(idCol))
      .filter(col("url_canon").isNotNull)
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as("first_" + idCol),
        count(lit(1)).as("n_dups"))

  /** Two-level public suffixes for the registrable-domain heuristic —
    * the high-traffic entries of the public suffix list (the FULL PSL is
    * a data file a production crawl ships alongside; this literal set is
    * the same mechanism at reduced coverage, and unknown two-level
    * suffixes degrade to eTLD+1 = last two labels, never to a crash).
    */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr", "com.ar")

  /** Registrable domain (eTLD+1 heuristic) of a HOST column: the last
    * two labels, or three when the last two form a known two-level
    * public suffix — the key crawl pipelines group by for quotas,
    * politeness, and per-site stats. Pure Column expression (one
    * regexp per suffix-arity), null/IP-safe (IPs pass through whole).
    */
  def registrableDomain(host: Column): Column = {
    val h = lower(host)
    val isIp = h.rlike("^\\d+\\.\\d+\\.\\d+\\.\\d+$")
    val last2 = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    // membership of the LAST-TWO-LABELS capture, not an OR-chain of
    // endsWith over the host: every suffix in the list is exactly two
    // labels, so the two are equivalent ("a.co.uk" → last2 "co.uk";
    // bare "co.uk" → last2 itself; "xco.uk" → last2 "xco.uk" ≠) — and
    // the chain form re-inlined the whole host expression once per
    // suffix in codegen, blowing the generated sort method past
    // janino's 64 KB limit downstream of a synthesized-URL projection
    // (interpreted fallback on every ext_domain_quota sort stage)
    val suffixIsTwoLevel =
      array_contains(typedLit(TwoLevelSuffixes), last2)
    when(h.isNull || h === "", null)
      .when(isIp, h)
      .when(suffixIsTwoLevel && last3 =!= "", last3)
      .otherwise(when(last2 === "", h).otherwise(last2))
  }

  /** Per-domain quota: keep at most `maxPerDomain` rows per registrable
    * domain of the canonical URL's host, selected by deterministic
    * (md5(id), id) rank — the crawl-diversity cap that stops one domain
    * from dominating a training mix. Engine-portable: selection is a
    * pure function of (ids, domains, cap) at any partitioning.
    *
    * Rows whose URL yields NO domain (malformed, scheme-less) PASS
    * THROUGH with a null `domain` — a diversity cap must not silently
    * become a validity filter (the pipeline's pass-through posture for
    * unparseable URLs); quarantine them separately if that is wanted.
    */
  def domainQuota(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      maxPerDomain: Int,
      trackingParams: Seq[String] = DefaultTrackingParams): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    require(!df.columns.contains("domain"), "'domain' column is reserved")
    val host = lower(try_parse_url(trim(col(urlCol)), lit("HOST")))
    val withDomain = df.withColumn("domain",
      registrableDomain(regexp_replace(host, "^www\\.", "")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("domain")
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    val quotaed = withDomain
      .filter(col("domain").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerDomain)
      .drop("__rn")
    quotaed.unionByName(withDomain.filter(col("domain").isNull))
  }
}
