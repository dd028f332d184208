package graft.text

import scala.collection.mutable

/** sitemaps.org XML (the robots.txt companion — what `Sitemap:` lines
  * point a crawler at): lenient extraction of `<urlset>` entries
  * (loc / lastmod / changefreq / priority) and `<sitemapindex>`
  * children, with entity decoding on loc (the protocol requires
  * URLs entity-escaped) and CDATA tolerated. Never throws; malformed
  * tails yield the entries before them — the crawl-frontier feed for
  * a discovery pipeline.
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: String,
                         priority: String)
  /** kind: "urlset" | "sitemapindex" | "" (unrecognized). */
  final case class Doc(kind: String, entries: Seq[Entry])

  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&") // last: the escape of the escape

  private def cdata(s: String): String = {
    val t = s.trim
    if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
      t.substring(9, t.length - 3)
    else unescape(t)
  }

  /** Text between `<tag>` and `</tag>` starting at `from`; the tag
    * match tolerates attributes on the open tag. */
  private def tagText(xml: String, tag: String, from: Int, until: Int)
      : Option[String] = {
    var at = from
    while (at < until) {
      val open = xml.indexOf("<" + tag, at)
      if (open < 0 || open >= until) return None
      val gt = xml.indexOf('>', open)
      if (gt < 0 || gt >= until) return None
      // reject a longer tag name sharing the prefix (<locX>)
      val nameEnd = open + 1 + tag.length
      if (nameEnd >= xml.length) return None
      val c = xml.charAt(nameEnd)
      if (c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '/') {
        val close = xml.indexOf("</" + tag, gt + 1)
        if (close < 0 || close > until) return None
        return Some(cdata(xml.substring(gt + 1, close)))
      }
      at = gt + 1
    }
    None
  }

  def parse(xml: String): Doc = {
    val isIndex = xml.contains("<sitemapindex")
    val isUrlset = xml.contains("<urlset")
    if (!isIndex && !isUrlset) return Doc("", Seq.empty)
    val itemTag = if (isIndex) "sitemap" else "url"
    val out = mutable.ArrayBuffer[Entry]()
    var at = 0
    var ok = true
    while (ok) {
      val open = xml.indexOf("<" + itemTag, at)
      val openOk = open >= 0 &&
        open + 1 + itemTag.length < xml.length && {
          val c = xml.charAt(open + 1 + itemTag.length)
          c == '>' || c == ' ' || c == '\n'
        }
      if (open < 0) ok = false
      else if (!openOk) at = open + 1
      else {
        val close = xml.indexOf("</" + itemTag + ">", open)
        if (close < 0) ok = false
        else {
          tagText(xml, "loc", open, close).foreach { loc =>
            out += Entry(loc,
              tagText(xml, "lastmod", open, close).getOrElse(""),
              tagText(xml, "priority", open, close).getOrElse(""))
          }
          at = close + 1
        }
      }
    }
    Doc(if (isIndex) "sitemapindex" else "urlset", out.toSeq)
  }
}
