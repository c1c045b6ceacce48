package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TextOps.subtitleCues: SRT/WebVTT cue parsing — timing arithmetic,
  * flavor dispatch, multi-line joins, skip semantics, hostility.
  */
class SubtitleSpec extends AnyFunSuite {

  test("SRT parses: indices ignored, comma decimals, multi-line " +
    "text joined, ordinals count emitted cues") {
    val srt =
      """1
        |00:00:01,500 --> 00:00:03,000
        |hello
        |world
        |
        |7
        |00:01:02,250 --> 00:01:04,000
        |single
        |""".stripMargin
    assert(TextOps.subtitleCues(srt) === Seq(
      (0, 1500L, 3000L, "hello\nworld"),
      (1, 62250L, 64000L, "single")))
  }

  test("WebVTT parses: header block skipped, dot decimals, cue " +
    "settings tolerated, NOTE blocks skipped, hour arithmetic") {
    val vtt =
      """WEBVTT
        |
        |NOTE this block has no timing and is skipped
        |
        |01:02:03.450 --> 01:02:05.000 align:start position:10%
        |styled cue
        |
        |id-line
        |00:00:00.000 --> 00:00:01.000
        |after id
        |""".stripMargin
    assert(TextOps.subtitleCues(vtt) === Seq(
      (0, 3723450L, 3725000L, "styled cue"),
      (1, 0L, 1000L, "after id")))
  }

  test("WebVTT short form: the spec-legal MM:SS.mmm timing without " +
    "an hours component parses with hours = 0, mixed with long form") {
    val vtt =
      """WEBVTT
        |
        |00:05.000 --> 00:07.250
        |short form
        |
        |01:00:05.000 --> 01:00:07.000
        |long form
        |
        |02:30.100 --> 1:02:30.200
        |mixed endpoints
        |""".stripMargin
    assert(TextOps.subtitleCues(vtt) === Seq(
      (0, 5000L, 7250L, "short form"),
      (1, 3605000L, 3607000L, "long form"),
      (2, 150100L, 3750200L, "mixed endpoints")))
  }

  test("skip semantics: malformed timing, end < start, empty text, " +
    "timing buried past line two; hostility never throws") {
    val mixed =
      """1
        |garbage timing
        |dropped
        |
        |2
        |00:00:05,000 --> 00:00:04,000
        |dropped (end < start)
        |
        |3
        |00:00:06,000 --> 00:00:07,000
        |
        |extra
        |buried
        |00:00:08,000 --> 00:00:09,000
        |dropped (timing past line 2)
        |
        |00:00:10,000 --> 00:00:11,000
        |kept
        |""".stripMargin
    // block 3 has an empty first text region up to the blank line —
    // the blank line ENDS the block, so its body is empty -> dropped
    assert(TextOps.subtitleCues(mixed) === Seq(
      (0, 10000L, 11000L, "kept")))
    assert(TextOps.subtitleCues(null) === Seq.empty)
    assert(TextOps.subtitleCues("") === Seq.empty)
    assert(TextOps.subtitleCues("no cues at all\njust text") === Seq.empty)
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(200))(
        rnd.nextPrintableChar()).mkString
      TextOps.subtitleCues(junk) // never throws
    }
  }
}
