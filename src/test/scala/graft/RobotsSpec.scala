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
    // recurring final segment: greedy-leftmost placement must not cause a
    // false negative when the segment also occurs at the end (RFC 9309 /
    // Google reference matcher behavior)
    assert(Robots.matches("/*.json$", "/a.json/b.json"))
    assert(!Robots.matches("/*.json$", "/a.json/b.jsonx"))
    assert(Robots.matches("/*ab*ab$", "/abab"))  // segments may not overlap...
    assert(Robots.matches("/*ab*ab$", "/xabyab"))
    assert(!Robots.matches("/*ab*ab$", "/ab"))   // ...or double-count one hit
    // single-segment anchored pattern is exact equality
    assert(Robots.matches("/exact$", "/exact"))
    assert(!Robots.matches("/exact$", "/exact/sub"))
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

  test("sitemap: urlset, index, entities, CDATA, malformed tails") {
    import graft.text.Sitemap
    val u = Sitemap.parse(
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://x/a?b=1&amp;c=2</loc>
        |  <lastmod>2026-01-01</lastmod><priority>0.5</priority></url>
        |<url><loc><![CDATA[https://x/raw?b=1&c=2]]></loc></url>
        |</urlset>""".stripMargin)
    assert(u.kind == "urlset")
    assert(u.entries == Seq(
      Sitemap.Entry("https://x/a?b=1&c=2", "2026-01-01", "0.5"),
      Sitemap.Entry("https://x/raw?b=1&c=2", "", "")))
    val i = Sitemap.parse("<sitemapindex><sitemap>" +
      "<loc>https://x/m1.xml</loc></sitemap><sitemap>" +
      "<loc>https://x/m2.xml</loc></sitemap></sitemapindex>")
    assert(i.kind == "sitemapindex" && i.entries.map(_.loc) ==
      Seq("https://x/m1.xml", "https://x/m2.xml"))
    // junk, truncation: never throws, prefix survives
    assert(Sitemap.parse("not xml").kind == "")
    val full = "<urlset><url><loc>https://x/1</loc></url>" +
      "<url><loc>https://x/2</loc></url></urlset>"
    (0 until full.length by 3).foreach { n =>
      val doc = Sitemap.parse(full.take(n))
      assert(doc.entries.size <= 2)
    }
    // an entry with no loc is skipped, later entries survive
    assert(Sitemap.parse("<urlset><url><lastmod>x</lastmod></url>" +
      "<url><loc>https://x/ok</loc></url></urlset>")
      .entries.map(_.loc) == Seq("https://x/ok"))
  }
}
