package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TextOps.htmlText: the html -> visible-text step of the Common
  * Crawl front-end — script/style/comment removal, block tags to
  * newlines / inline tags to spaces (LINE-STRUCTURED output, the
  * shape removeBoilerplate and C4's line-based rules require),
  * entity decoding, per-line whitespace collapse, hostility.
  */
class HtmlTextSpec extends AnyFunSuite {

  test("block tags become line boundaries, inline tags spaces, " +
    "script/style/comments drop wholesale, entities decode, " +
    "whitespace collapses within lines") {
    val html = "<html><head><title>T</title>" +
      "<style>p { color: red; }</style></head>" +
      "<body><!-- a comment with <p>tags</p> inside -->" +
      "<h1>Page  One</h1><p>body &amp; text &#233; &#x41;</p>" +
      "<SCRIPT type=\"text/js\">var x = \"<b>not text</b>\";</SCRIPT>" +
      "<div>tail&nbsp;word</div></body></html>"
    assert(TextOps.htmlText(html) ===
      "T\nPage One\nbody & text é A\ntail word")
    // block-level siblings land on separate lines...
    assert(TextOps.htmlText("<p>one</p><p>two</p>") === "one\ntwo")
    assert(TextOps.htmlText("x<br>y") === "x\ny")
    assert(TextOps.htmlText("<li>a</li><li>b</li>") === "a\nb")
    // ...inline elements separate words on the SAME line
    assert(TextOps.htmlText("one <b>two</b> three") === "one two three")
    assert(TextOps.htmlText("<span>a</span><span>b</span>") === "a b")
    assert(TextOps.htmlText("a<em>b</em>c") === "a b c")
    // a comment separates words, not blocks
    assert(TextOps.htmlText("a<!-- x -->b") === "a b")
    // unknown entities pass through literally, never mangled
    assert(TextOps.htmlText("a &unknown; b &#xzz; c") ===
      "a &unknown; b &#xzz; c")
    // case-insensitive tag names, attributes with > in quotes are a
    // known simple-scanner limit (first > ends the tag) — documented
    assert(TextOps.htmlText("<STYLE>x</Style>after") === "after")
    // no leading/trailing newlines, empty lines dropped
    assert(TextOps.htmlText("<div></div><p>only</p><div></div>") ===
      "only")
  }

  test("hostility: unterminated constructs, null/empty, fuzz never " +
    "throws") {
    assert(TextOps.htmlText(null) === "")
    assert(TextOps.htmlText("") === "")
    assert(TextOps.htmlText("<script>never closed") === "")
    assert(TextOps.htmlText("<!-- never closed") === "")
    assert(TextOps.htmlText("<p unterminated") === "")
    assert(TextOps.htmlText("plain text stays") === "plain text stays")
    val rnd = new scala.util.Random(37)
    (1 to 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(
        "<>&;#xabc XYZ /-\"'".charAt(rnd.nextInt(18))).mkString
      TextOps.htmlText(junk) // never throws
    }
  }
}
