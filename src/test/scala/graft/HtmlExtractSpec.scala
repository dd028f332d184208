package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.HtmlExtract

class HtmlExtractSpec extends AnyFunSuite {

  test("tags strip, blocks break, inline tags don't") {
    val html = "<html><body><h1>Title</h1><p>one <b>bold</b> two</p>" +
      "<div>three</div>four<br>five</body></html>"
    assert(HtmlExtract.lines(html) ==
      Seq("Title", "one bold two", "three", "four", "five"))
  }

  test("script/style/noscript subtrees skipped entirely") {
    val html = "<p>a</p><script>var x = \"<p>trap</p> &amp;\";</script>" +
      "<style>p { color: red; }</style><p>b</p>" +
      "<SCRIPT type='t'>more <div> traps</SCRIPT><p>c</p>"
    assert(HtmlExtract.lines(html) == Seq("a", "b", "c"))
  }

  test("entities decode; bad entities stay literal") {
    assert(HtmlExtract.text("<p>a &amp; b &lt;c&gt; &#33; &#x41;</p>") ==
      "a & b <c> ! A")
    assert(HtmlExtract.text("<p>5 &notanentity; &#xZZ; & co</p>") ==
      "5 &notanentity; &#xZZ; & co")
    assert(HtmlExtract.text("<p>x&nbsp;y</p>") == "x y")
    // astral code points decode to surrogate PAIRS, not truncated
    // BMP chars; out-of-range values stay literal
    assert(HtmlExtract.text("<p>hi &#128512; &#x1F600;</p>") ==
      "hi 😀 😀")
    assert(HtmlExtract.text("<p>&#1114112; end</p>") == "&#1114112; end")
    // surrogate-range references would decode to LONE surrogates
    // (ill-formed UTF-16) — they stay literal like out-of-range
    assert(HtmlExtract.text("<p>&#55296; &#xD800; &#xDFFF; e</p>") ==
      "&#55296; &#xD800; &#xDFFF; e")
    assert(HtmlExtract.text("<p>&#55296;</p>").forall(c =>
      !Character.isSurrogate(c)))
  }

  test("whitespace collapses, blank lines drop") {
    val html = "<p>  a\t\tb \n c  </p><p>   </p><p>d</p>"
    assert(HtmlExtract.lines(html) == Seq("a b c", "d"))
  }

  test("quoted attributes may contain '>'") {
    assert(HtmlExtract.text("<p title=\"a > b\">x</p><p a='>'>y</p>") ==
      "x\ny")
  }

  test("comments skipped; malformed markup degrades to text") {
    assert(HtmlExtract.text("a<!-- <p>no</p> -->b") == "ab")
    assert(HtmlExtract.text("2 < 3 and 5 > 4") == "2 < 3 and 5 > 4")
    assert(HtmlExtract.text("<p>unclosed") == "unclosed")
    assert(HtmlExtract.text("<script>never closed") == "")
    assert(HtmlExtract.text("<!-- never closed") == "")
    assert(HtmlExtract.text("") == "")
  }

  test("fuzz: arbitrary input never throws") {
    var s = 777L
    for (_ <- 0 until 300) {
      val len = (s % 80).toInt.abs
      val chars = "<>&;/ab c\"'-!#x1\n\t"
      val str = new String(Array.fill(len) {
        s = s * 6364136223846793005L + 1442695040888963407L
        chars(((s >>> 33) % chars.length).toInt)
      })
      HtmlExtract.lines(str) // must not throw
      s += 1
    }
  }
}
