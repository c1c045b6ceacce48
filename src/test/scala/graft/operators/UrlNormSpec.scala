package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TextOps.normalizeUrl: crawl-level URL canonicalization. */
class UrlNormSpec extends AnyFunSuite {

  test("case folding, default ports, tracking params, param sort, " +
    "fragments, empty path") {
    import TextOps.normalizeUrl
    assert(normalizeUrl("HTTP://WWW.Example.COM:80/A/B?z=1&a=2#frag") ===
      "http://www.example.com/A/B?a=2&z=1")
    assert(normalizeUrl("https://ex.com:443/p") === "https://ex.com/p")
    // a NON-default port survives
    assert(normalizeUrl("https://ex.com:8443/p") ===
      "https://ex.com:8443/p")
    // path case/encoding preserved (paths are case-sensitive by spec)
    assert(normalizeUrl("https://Ex.com/CaseSensitive%2Fpath") ===
      "https://ex.com/CaseSensitive%2Fpath")
    // tracking params stripped, including utm_* and fbclid family
    assert(normalizeUrl(
      "https://ex.com/p?utm_source=x&b=2&fbclid=abc&a=1&UTM_medium=y")
      === "https://ex.com/p?a=1&b=2")
    // all params stripped -> no '?'
    assert(normalizeUrl("https://ex.com/p?utm_only=1") ===
      "https://ex.com/p")
    // empty path normalizes to '/'
    assert(normalizeUrl("https://EX.com") === "https://ex.com/")
    assert(normalizeUrl("https://ex.com#top") === "https://ex.com/")
  }

  test("hostility: non-absolute and garbage inputs come back " +
    "trimmed/unchanged; never throws") {
    import TextOps.normalizeUrl
    assert(normalizeUrl(null) === "")
    assert(normalizeUrl("") === "")
    assert(normalizeUrl("  relative/path  ") === "relative/path")
    assert(normalizeUrl("mailto:x@y.z") === "mailto:x@y.z")
    assert(normalizeUrl("://nohost") === "://nohost")
    val rnd = new scala.util.Random(43)
    (1 to 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(80))(
        ":/?#&=.aZ9%".charAt(rnd.nextInt(11))).mkString
      TextOps.normalizeUrl(junk) // never throws
    }
  }
}
