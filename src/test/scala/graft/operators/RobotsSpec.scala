package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Robots (RFC 9309): group selection, longest-match evaluation,
  * wildcard/anchor patterns, and the DataFrame filter — pinned
  * against the spec's own documented examples.
  */
class RobotsSpec extends SparkSuite {
  import spark.implicits._

  test("longest match decides; allow wins a length tie; no match " +
    "allows (RFC 9309 2.2.2 examples)") {
    val txt =
      """User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |Allow: /p
        |""".stripMargin
    assert(Robots.isAllowed(txt, "anybot", "/public/x"))
    assert(!Robots.isAllowed(txt, "anybot", "/private/secret"))
    assert(Robots.isAllowed(txt, "anybot", "/private/ok/file"))
    assert(Robots.isAllowed(txt, "anybot", "/pr")) // /p allow > none
    // allow/disallow of EQUAL length: allow wins
    val tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert(Robots.isAllowed(tie, "anybot", "/page"))
  }

  test("'*' wildcards and the '$' end anchor") {
    val txt =
      """User-agent: *
        |Disallow: /*.tmp$
        |Disallow: /w*z
        |""".stripMargin
    assert(!Robots.isAllowed(txt, "b", "/a/file.tmp"))
    assert(Robots.isAllowed(txt, "b", "/a/file.tmp.keep")) // anchored
    assert(!Robots.isAllowed(txt, "b", "/wxyz/deep")) // prefix w..z
    assert(Robots.isAllowed(txt, "b", "/wxy"))
    // a rule ending in '*' is the same prefix rule without it
    val star = "User-agent: *\nDisallow: /dir*\n"
    assert(!Robots.isAllowed(star, "b", "/dir/sub"))
    assert(!Robots.isAllowed(star, "b", "/directory"))
  }

  test("most specific agent group wins outright (no merge with " +
    "'*'); same-token groups merge; fetch-absent allows all") {
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /no
        |
        |Sitemap: https://x/sitemap.xml
        |
        |User-agent: graftbot
        |Disallow: /also
        |
        |User-agent: graft
        |Disallow: /short
        |""".stripMargin
    // graftbot: its two groups merge; the '*' Disallow / and the
    // shorter-prefix 'graft' group are NOT consulted
    assert(!Robots.isAllowed(txt, "graftbot", "/no/x"))
    assert(!Robots.isAllowed(txt, "graftbot", "/also/x"))
    assert(Robots.isAllowed(txt, "graftbot", "/short/x"))
    assert(Robots.isAllowed(txt, "graftbot", "/anything"))
    // an unknown bot falls to '*': everything blocked
    assert(!Robots.isAllowed(txt, "otherbot", "/anything"))
    // no robots.txt: allowed
    assert(Robots.isAllowed(null, "graftbot", "/x"))
    assert(Robots.rulesFor(null, "graftbot").isEmpty)
  }

  test("parsing forgiving-ness: comments, case-insensitive keys, " +
    "empty-path no-op rules, rules before any user-agent line") {
    val txt =
      """# header comment
        |DISALLOW: /orphan
        |User-Agent: *   # trailing comment
        |disallow:
        |ALLOW: /a
        |Disallow: /b
        |""".stripMargin
    val rules = Robots.rulesFor(txt, "bot")
    assert(rules === Seq(Robots.Rule(true, "/a"),
      Robots.Rule(false, "/b")))
    assert(Robots.isAllowed(txt, "bot", "/orphan/x")) // dropped rule
  }

  test("robotsFilter: per-host gate over a URL table, query string " +
    "included in the match, missing host row allows") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /priv\nAllow: /priv/ok\n"),
      ("b.com", "User-agent: graftbot\nDisallow: /*?drop=1$\n"))
      .toDF("host", "txt")
    val urls = Seq(
      "https://a.com/ok/page",
      "https://a.com/priv/page",
      "https://a.com/priv/ok/page",
      "https://b.com/page?drop=1",
      "https://b.com/page?drop=10",
      "https://nohost.com/priv/anything")
      .toDF("url")
    val kept = Robots.robotsFilter(urls, "url", robots, "host",
      "txt", "graftbot").collect().map(_.getString(0)).toSet
    assert(kept === Set(
      "https://a.com/ok/page",
      "https://a.com/priv/ok/page",
      "https://b.com/page?drop=10",
      "https://nohost.com/priv/anything"))
  }
}
