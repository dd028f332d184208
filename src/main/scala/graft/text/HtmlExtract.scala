package graft.text

/** HTML → text extraction — the CommonCrawl-style main-text stage a
  * training pipeline runs before any quality/dedup filtering: strip
  * tags, skip raw-text subtrees (script/style/noscript) and comments,
  * decode entities, break lines at block elements, collapse
  * whitespace. Pure function over the string, codegen-adjacent (used
  * from mapPartitions; no state, no allocation beyond the builders),
  * never throws on malformed markup — unclosed tags, stray '<', bad
  * entities all degrade to literal text, the way lenient real-world
  * extractors behave.
  */
object HtmlExtract {

  private val Block: Set[String] = Set("p", "div", "br", "h1", "h2",
    "h3", "h4", "h5", "h6", "li", "ul", "ol", "tr", "table", "title",
    "head", "body", "html", "section", "article", "header", "footer",
    "blockquote", "pre", "hr", "form")
  /** Elements whose content is raw text, never markup (HTML5 §13.2.5):
    * skipped entirely — a '<p>' inside a script string is data. */
  private val RawText: Set[String] = Set("script", "style", "noscript",
    "textarea")

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Extracted text lines: block boundaries split, whitespace runs
    * collapsed, blank lines dropped. */
  def lines(html: String): Seq[String] = {
    val lower = html.toLowerCase
    val out = scala.collection.mutable.Buffer[String]()
    val line = new StringBuilder
    def break(): Unit = {
      val collapsed = line.toString.split("\\s+").filter(_.nonEmpty)
        .mkString(" ")
      if (collapsed.nonEmpty) out += collapsed
      line.clear()
    }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter ||
          html.charAt(i + 1) == '/' || html.charAt(i + 1) == '!')) {
          val closing = html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // to the tag end, respecting quoted attribute values
          var quote = 0.toChar
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            j += 1
          }
          i = if (j < n) j + 1 else n
          if (!closing && RawText(name)) {
            // skip to the matching close tag, case-insensitive
            val at = lower.indexOf("</" + name, i)
            i = if (at < 0) n else {
              val e = html.indexOf('>', at)
              if (e < 0) n else e + 1
            }
          }
          if (Block(name)) break()
        } else {
          line.append(c); i += 1 // stray '<': literal
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = html.substring(i + 1, semi)
          // Astral code points (&#128512;) become surrogate PAIRS via
          // Character.toChars; out-of-range values stay literal text.
          // The surrogate range (&#55296;..&#57343;) is out-of-range
          // too — decoding it would emit lone surrogates (ill-formed
          // UTF-16) downstream.
          def cp(v: Int): Option[String] =
            if (Character.isValidCodePoint(v) &&
              !(v >= Character.MIN_SURROGATE && v <= Character.MAX_SURROGATE))
              Some(new String(Character.toChars(v)))
            else None
          val dec: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try cp(Integer.parseInt(body.drop(2), 16))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try cp(Integer.parseInt(body.drop(1)))
              catch { case _: Exception => None }
            else Named.get(body)
          dec match {
            case Some(s) => line.append(s); i = semi + 1
            case None => line.append(c); i += 1 // bad entity: literal
          }
        } else { line.append(c); i += 1 }
      } else {
        line.append(c); i += 1
      }
    }
    break()
    out.toSeq
  }

  /** The extracted text as one newline-joined string. */
  def text(html: String): String = lines(html).mkString("\n")
}
