package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] robots.txt compliance filtering (RFC 9309) — the crawl
  * pipeline's FIRST legal/etiquette gate: before any page joins a
  * corpus, its URL must pass the host's robots rules for the
  * crawler's user-agent. Parsing and matching are implemented from
  * the public RFC:
  *
  *  - GROUPS: consecutive `User-agent:` lines open a group sharing
  *    the following `Allow:`/`Disallow:` rules; group selection for
  *    an agent takes the LONGEST user-agent token that
  *    case-insensitively PREFIXES the product token (the
  *    reference-parser convention: group "bot" serves "bot-news"),
  *    falling back to the `*` group, else no rules (allowed).
  *    Unknown directives (Crawl-delay, Sitemap, …) are ignored whole
  *    per the spec's extensibility rule — they neither attach rules
  *    nor split a User-agent run; `#` starts a comment.
  *  - MATCHING (§2.2.2): rules are path prefixes with `*` matching
  *    any byte run and a trailing `$` anchoring the end; the rule
  *    with the MOST SPECIFIC (longest pattern) match wins, and on a
  *    length tie ALLOW wins. An empty `Disallow:` matches nothing.
  *    No matching rule → allowed.
  *
  * Scale shape: [[filterAllowed]] compiles each host's rules ONCE
  * (one map over the robots table — never per URL), then equi-joins
  * URLs to rules by host (AQE free to broadcast the robots side — no
  * forced hint, the house rule) and evaluates the match in a typed
  * map. URLs whose host has NO robots row are allowed (the spec's
  * unreachable-robots default for 404).
  */
object Robots {

  /** One matchable rule: the raw pattern and its allow/disallow
    * sense. Patterns keep their `*`/`$` syntax; matching is
    * interpreted directly (no regex compilation per row).
    */
  final case class Rule(pattern: String, allow: Boolean)

  /** Group-resolved rules of one robots.txt body for one agent. */
  def rulesFor(txt: String, agent: String): Seq[Rule] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    // parse into groups: (agent tokens, rules)
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Rule])]
    var inAgents = false
    for (raw <- txt.linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case h  => raw.substring(0, h).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer
                .empty[String],
                scala.collection.mutable.ArrayBuffer.empty[Rule]))
              inAgents = true
            }
            groups.last._1 +=
              value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(value, key == "allow")
            // an empty Disallow: matches nothing (spec) — dropped
          case _ => () // Crawl-delay, Sitemap, unknown: IGNORED
          // entirely per the spec's extensibility rule — an ignored
          // line must not split a run of User-agent lines either
        }
      }
    }
    // longest case-insensitive agent token contained in the product
    // token wins; '*' is the fallback group
    var best: Option[(Int, Seq[Rule])] = None
    var star: Option[Seq[Rule]] = None
    for ((agents, rules) <- groups) {
      for (tok <- agents) {
        if (tok == "*") {
          if (star.isEmpty) star = Some(rules.toSeq)
        } else if (a.startsWith(tok) &&
          best.forall(_._1 < tok.length))
          // the reference-parser convention: a group's token matches
          // crawlers it PREFIXES (group "bot" serves "bot-news");
          // the longest matching token is the most specific group
          best = Some((tok.length, rules.toSeq))
      }
    }
    best.map(_._2).orElse(star).getOrElse(Nil)
  }

  /** §2.2.2 pattern match: literal prefix with `*` wildcards and an
    * optional trailing `$` end anchor.
    */
  private[ext] def patternMatches(pattern: String, path: String)
      : Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    // greedy segment match: split on '*', each segment must appear
    // in order; first segment anchors at 0; anchored patterns must
    // consume to the end
    val segs = p.split("\\*", -1)
    var at = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        at = seg.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment must END the path (at or after `at`)
        return path.length - seg.length >= at &&
          path.endsWith(seg)
      } else {
        val hit = path.indexOf(seg, at)
        if (hit < 0) return false
        at = hit + seg.length
      }
      i += 1
    }
    if (anchored) at == path.length else true
  }

  /** Longest-match verdict for one path: the longest-pattern
    * matching rule wins; on a tie ALLOW wins; no match → allowed.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules) {
      if (r.pattern.length >= bestLen && patternMatches(r.pattern, path)) {
        if (r.pattern.length > bestLen) {
          bestLen = r.pattern.length
          bestAllow = r.allow
        } else if (r.allow) bestAllow = true // tie: allow wins
      }
    }
    bestAllow
  }

  /** The path-and-query a robots rule matches against (§2.2.2 says
    * the fragment never participates). URL-less strings pass
    * through; a host with no slash is the root path.
    */
  private[ext] def pathOf(url: String): String = {
    val ss = url.indexOf("://")
    if (ss < 0) return url
    val slash = url.indexOf('/', ss + 3)
    if (slash < 0) {
      val qm = url.indexOf('?', ss + 3)
      return if (qm < 0) "/" else "/" + url.substring(qm)
    }
    {
      val frag = url.indexOf('#', slash)
      if (frag < 0) url.substring(slash) else url.substring(slash, frag)
    }
  }

  /** Filter a URL table by per-host robots rules for `agent`:
    * `urls(urlCol)` joined to `robots(hostCol, txtCol)` on the URL's
    * host — rules compiled ONCE per host (one map over the robots
    * table, never per URL), match evaluated per URL in a typed
    * filter (the extraction-table idiom), hosts without a robots row
    * allowed. Returns the allowed subset of `urls` with its original
    * columns — the compliance-gate shape. The host column is pure
    * SQL string algebra (codegen'd), so pruning/pushdown around the
    * join survives.
    */
  def filterAllowed(s: SparkSession, urls: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    // one compile per HOST: (host, [pattern], [allow])
    val compiled = robots
      .select(col(hostCol).as("r_host"), col(txtCol).as("r_txt"))
      .as[(String, String)]
      .map { case (h, t) =>
        val rs = rulesFor(if (t == null) "" else t, agent)
        (h.toLowerCase(java.util.Locale.ROOT),
          rs.map(_.pattern), rs.map(_.allow))
      }
      .toDF("r_host", "r_patterns", "r_allows")
    val withHost = urls.withColumn("u_host", lower(regexp_extract(
      col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1)))
    val joined = withHost.join(compiled,
      withHost("u_host") === compiled("r_host"), "left_outer")
    val patIdx = joined.schema.fieldIndex("r_patterns")
    val alIdx = joined.schema.fieldIndex("r_allows")
    val urlIdx = joined.schema.fieldIndex(urlCol)
    joined.filter((row: org.apache.spark.sql.Row) =>
      if (row.isNullAt(patIdx)) true // no robots for the host
      else {
        val rules = row.getSeq[String](patIdx)
          .zip(row.getSeq[Boolean](alIdx))
          .map { case (p, a) => Rule(p, a) }
        allowed(rules, pathOf(row.getString(urlIdx)))
      }).drop("u_host", "r_host", "r_patterns", "r_allows")
  }
}
