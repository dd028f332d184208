package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Robots

/** RFC 9309 edge cases: group formation, specificity, precedence. */
class RobotsSpec extends AnyFunSuite {

  test("group grammar: comments, case, unknown keys, stray rules") {
    val g = Robots.parse(
      """Disallow: /ignored-before-any-group/
        |# a comment line
        |USER-AGENT: BotA   # trailing comment
        |User-agent: botb
        |Disallow: /a/
        |Crawl-delay: 10
        |Allow: /a/ok/
        |
        |User-agent: *
        |Disallow: /x/
        |""".stripMargin)
    assert(g.size == 2)
    assert(g(0).agents == Seq("bota", "botb")) // consecutive UAs share
    assert(g(0).rules == Seq(Robots.Rule(false, "/a/"),
      Robots.Rule(true, "/a/ok/"))) // unknown key kept the group open
    assert(g(1).agents == Seq("*"))
    // the stray rule before any group was dropped
    assert(!Robots.allowed(g, "bota", "/a/x"))
    assert(Robots.allowed(g, "bota", "/a/ok/x")) // longest match wins
    assert(Robots.allowed(g, "bota", "/x/q")) // * group not applicable
    assert(!Robots.allowed(g, "unknown", "/x/q")) // falls back to *
    assert(Robots.allowed(g, "unknown", "/y"))
  }

  test("specificity: longest matching user-agent token set wins") {
    val g = Robots.parse(
      """User-agent: bot
        |Disallow: /a/
        |User-agent: botlong
        |Disallow: /b/
        |User-agent: botlong
        |Disallow: /c/
        |User-agent: *
        |Disallow: /
        |""".stripMargin)
    // botlong/2 matches both "bot" and "botlong": only the longest
    // token's groups apply — and BOTH botlong groups combine
    assert(Robots.allowed(g, "botlong/2", "/a/f"))
    assert(!Robots.allowed(g, "botlong/2", "/b/f"))
    assert(!Robots.allowed(g, "botlong/2", "/c/f"))
    assert(!Robots.allowed(g, "bot/1", "/a/f"))
    assert(Robots.allowed(g, "bot/1", "/b/f"))
  }

  test("patterns: wildcard, $ anchor, empty disallow, tie → allow") {
    assert(Robots.matches("/p/*.php", "/p/x/y.php"))
    assert(!Robots.matches("/p/*.php", "/q/y.php"))
    assert(Robots.matches("/*.json$", "/a/b.json"))
    assert(!Robots.matches("/*.json$", "/a/b.jsonx"))
    assert(Robots.matches("/a*$", "/a/anything"))
    assert(!Robots.matches("", "/anything")) // empty Disallow: allow all
    val g = Robots.parse(
      """User-agent: x
        |Disallow:
        |Disallow: /d1/
        |Allow: /d1/
        |""".stripMargin)
    assert(Robots.allowed(g, "x", "/anywhere"))
    // equal-length allow and disallow: allow wins
    assert(Robots.allowed(g, "x", "/d1/f"))
    // no groups at all: allowed
    assert(Robots.allowed(Seq.empty, "any", "/p"))
  }
}
