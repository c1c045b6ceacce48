package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, udf}

/** The Robots Exclusion Protocol (RFC 9309) — the gate a polite
  * crawl pipeline applies between the URL frontier and the fetch
  * (and that a corpus builder re-applies when honoring robots
  * retroactively). From-the-spec implementation: group parsing
  * (consecutive user-agent lines open a group; allow/disallow
  * rules attach to it; comments and unknown directives skipped),
  * most-specific-agent group selection with same-token merging and
  * the '*' fallback, and longest-match rule evaluation over path +
  * query with '*' wildcards and the '$' end anchor — an allow wins
  * length ties (RFC 9309 §2.2.2). No rule matching -> allowed; no
  * robots.txt at all -> allowed.
  *
  * Reference analog: none — the reference has no crawl surface;
  * this is LLM-pipeline front-end the survey adds beyond it
  * (SURVEY.md north-star: web-corpus ingestion).
  */
object Robots {

  /** One parsed rule: allow?, raw path pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body and select the rule set RFC 9309 says
    * applies to `agent` (a product token like "graftbot"): groups
    * whose most specific matching user-agent token (case-
    * insensitive prefix of the product token) has maximal length
    * are merged; absent any, the '*' groups; absent those, no
    * rules. Empty-path rules are the spec's "allow all" no-ops and
    * are dropped. Never throws.
    */
  def rulesFor(robotsTxt0: String, agent: String): Seq[Rule] = {
    if (robotsTxt0 == null) return Seq.empty
    // RFC 9309 §2.5 parse bound: crawlers parse at least 500 KiB;
    // beyond it a hostile robots.txt stops costing anything
    val robotsTxt =
      if (robotsTxt0.length > 512 * 1024)
        robotsTxt0.substring(0, 512 * 1024)
      else robotsTxt0
    // group assembly: consecutive user-agent lines share the group
    // that the rules following them attach to
    val groups =
      scala.collection.mutable.ArrayBuffer[(
        scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Rule])]()
    var inAgents = false
    robotsTxt.split("\n", -1).foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase(
          java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer[String](),
                scala.collection.mutable.ArrayBuffer[Rule]()))
              inAgents = true
            }
            if (value.nonEmpty)
              groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(key == "allow", value)
          // sitemap / crawl-delay / unknown directives are skipped
          // WITHOUT ending the open user-agent run (the reference
          // parser behavior: only rules close it)
          case _ => ()
        }
      }
    }
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    def matchLen(tok: String): Int =
      if (tok == "*") 0
      else if (a.startsWith(tok)) tok.length
      else -1
    val best = groups.iterator
      .flatMap(_._1.iterator.map(matchLen)).filter(_ > 0)
      .foldLeft(-1)(math.max)
    val chosen =
      if (best > 0) groups.filter(_._1.exists(matchLen(_) == best))
      else groups.filter(_._1.contains("*"))
    chosen.iterator.flatMap(_._2).toSeq
  }

  /** Does `pattern` (with '*' wildcards; '$' anchors the end) match
    * the path? Unanchored patterns are prefix matches — equivalent
    * to appending '*'. Iterative two-pointer wildcard match: O(n*m)
    * worst case on hostile patterns, linear on real ones.
    */
  private[operators] def patternMatches(
      pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat0 = if (anchored) pattern.dropRight(1) else pattern
    val pat = if (anchored) pat0 else pat0 + "*"
    var p = 0
    var s = 0
    var star = -1
    var mark = 0
    while (s < path.length) {
      if (p < pat.length && pat.charAt(p) == '*') {
        star = p
        mark = s
        p += 1
      } else if (p < pat.length && pat.charAt(p) == path.charAt(s)) {
        p += 1
        s += 1
      } else if (star >= 0) {
        p = star + 1
        mark += 1
        s = mark
      } else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  /** RFC 9309 §2.2.2 evaluation: the longest-pattern matching rule
    * decides; an allow wins a length tie; no match -> allowed.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val l = r.pattern.length
        if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
          bestLen = l
          bestAllow = r.allow
        }
      }
    }
    bestLen < 0 || bestAllow
  }

  /** One-shot convenience: parse + evaluate. */
  def isAllowed(robotsTxt: String, agent: String,
      path: String): Boolean =
    allowed(rulesFor(robotsTxt, agent), path)

  /** Filter a URL table by each host's robots.txt for `agent`:
    * robots are parsed ONCE per host into a rules column, joined to
    * the URLs on the host key (an equi-join that shuffles on host at
    * any scale — the robots side is one small row per host), and
    * every URL whose path + query the selected rules disallow is
    * dropped. Hosts with no robots row pass everything (the
    * fetch-failed = allowed posture of RFC 9309 §2.3.1.3). Adds
    * nothing to the schema.
    */
  def robotsFilter(
      urls: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val parse = udf((txt: String) =>
      rulesFor(txt, agent).map(r => (r.allow, r.pattern)))
    val eval = udf((rules: Seq[(Boolean, String)], path: String) =>
      rules == null ||
        allowed(rules.map(t => Rule(t._1, t._2)),
          if (path == null || path.isEmpty) "/" else path))
    val ruleTab = robots.select(
      col(hostCol).as("__rhost"), parse(col(txtCol)).as("__rules"))
    urls
      .withColumn("__host", expr(s"parse_url($urlCol, 'HOST')"))
      .withColumn("__path", coalesce(
        expr(s"concat(parse_url($urlCol, 'PATH'), " +
          s"coalesce(concat('?', parse_url($urlCol, 'QUERY')), ''))"),
        lit("/")))
      .join(ruleTab, col("__host") === col("__rhost"), "left")
      .where(eval(col("__rules"), col("__path")))
      .drop("__host", "__path", "__rhost", "__rules")
  }
}
