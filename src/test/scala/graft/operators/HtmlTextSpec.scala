package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TextOps.htmlText: the html -> visible-text step of the Common
  * Crawl front-end — script/style/comment removal, tag-to-space,
  * entity decoding, whitespace collapse, hostility.
  */
class HtmlTextSpec extends AnyFunSuite {

  test("tags strip to spaces, script/style/comments drop wholesale, " +
    "entities decode, whitespace collapses") {
    val html = "<html><head><title>T</title>" +
      "<style>p { color: red; }</style></head>" +
      "<body><!-- a comment with <p>tags</p> inside -->" +
      "<h1>Page  One</h1><p>body &amp; text &#233; &#x41;</p>" +
      "<SCRIPT type=\"text/js\">var x = \"<b>not text</b>\";</SCRIPT>" +
      "<div>tail&nbsp;word</div></body></html>"
    assert(TextOps.htmlText(html) ===
      "T Page One body & text é A tail word")
    // adjacent elements never fuse words
    assert(TextOps.htmlText("<p>one</p><p>two</p>") === "one two")
    // unknown entities pass through literally, never mangled
    assert(TextOps.htmlText("a &unknown; b &#xzz; c") ===
      "a &unknown; b &#xzz; c")
    // case-insensitive tag names, attributes with > in quotes are a
    // known simple-scanner limit (first > ends the tag) — documented
    assert(TextOps.htmlText("<STYLE>x</Style>after") === "after")
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
