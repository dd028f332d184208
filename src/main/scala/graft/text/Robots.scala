package graft.text

import scala.collection.mutable

/** robots.txt (RFC 9309) — the crawl-shaping filter a web-corpus
  * pipeline applies before anything else: parse the group grammar,
  * pick the most specific user-agent group, and decide each URL path
  * by the longest-match rule with the allow tie-break. Pure functions;
  * the parsed ruleset is a broadcast-sized table per host at corpus
  * scale (the q291 gate runs parse+decide inside mapPartitions).
  *
  * Grammar subset per the RFC: `key: value` lines, case-insensitive
  * keys, `#` comments, groups formed by consecutive User-agent lines
  * followed by Allow/Disallow rules (rules before any group are
  * ignored, unknown keys skipped but do NOT split a group), `*`
  * wildcard and `$` end anchor in patterns, empty Disallow ≡ allow
  * everything. Decision: the group set with the LONGEST user-agent
  * token that prefixes the caller's product token wins (all groups
  * with that token combine; `*` groups apply only when no named group
  * matched); among matching rules the longest pattern wins and an
  * allow beats a disallow of equal length; no matching rule → allowed.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  def parse(body: String): Seq[Group] = {
    val groups = mutable.ArrayBuffer[Group]()
    var agents = mutable.ArrayBuffer[String]()
    var rules = mutable.ArrayBuffer[Rule]()
    var inAgents = false // consecutive User-agent lines extend the group
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = mutable.ArrayBuffer[String]()
      rules = mutable.ArrayBuffer[Rule]()
    }
    body.split("\n", -1).foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i => raw.substring(0, i)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents += value.toLowerCase
            inAgents = true
          case "allow" =>
            inAgents = false
            if (agents.nonEmpty) rules += Rule(allow = true, value)
          case "disallow" =>
            inAgents = false
            if (agents.nonEmpty) rules += Rule(allow = false, value)
          case _ => // sitemap, crawl-delay, unknown: keep the group open
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** `*`-wildcard / `$`-anchored rule match against a URL path.
    *
    * Middle segments place greedily-leftmost (leftmost leaves maximal room
    * for later segments). The FINAL segment of a `$`-anchored pattern must
    * instead sit exactly at the end of the path — checked via endsWith with
    * its start at/after the position the preceding segments reached, so a
    * recurring segment (pattern `*.json$` vs path `/a.json/b.json`) still
    * matches.
    */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false // empty Disallow: no match
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    if (parts.length == 1)
      return if (anchored) path == parts(0) else path.startsWith(parts(0))
    if (!path.startsWith(parts(0))) return false
    var at = parts(0).length
    var i = 1
    val lastIdx = parts.length - 1
    while (i < lastIdx) {
      val found = path.indexOf(parts(i), at)
      if (found < 0) return false
      at = found + parts(i).length
      i += 1
    }
    val last = parts(lastIdx)
    if (last.isEmpty) true // a trailing '*' allows anything, anchored or not
    else if (anchored) path.endsWith(last) && path.length - last.length >= at
    else path.indexOf(last, at) >= 0
  }

  /** RFC 9309 §2.2.1 group choice + §2.2.2 rule precedence. */
  def allowed(groups: Seq[Group], agent: String, path: String): Boolean = {
    val tok = agent.toLowerCase
    val named = groups.flatMap { g =>
      g.agents.filter(a => a != "*" && tok.startsWith(a))
        .maxByOption(_.length).map(a => (a.length, g))
    }
    val applicable: Seq[Group] =
      if (named.nonEmpty) {
        val best = named.map(_._1).max
        named.collect { case (l, g) if l == best => g }
      } else groups.filter(_.agents.contains("*"))
    val hits = applicable.flatMap(_.rules)
      .filter(r => matches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val maxLen = hits.map(_.pattern.length).max
      hits.filter(_.pattern.length == maxLen).exists(_.allow)
    }
  }
}
