package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's two variance guards: the intra-run spread check
  * lives in the rep loop; these cover the committed-baseline parser
  * and the uniform-contention comparison (a query whose every rep is
  * slow-but-tight slipped past the spread check in round 12).
  */
class BenchGuardSpec extends AnyFunSuite {

  private val line =
    """{"metric":"total","value":138.9,"unit":"sec","reps":3,""" +
      """"queries":{"q_a":1.5,"q_b":0.25,"q_dead":null},""" +
      """"runs":{"q_a":[1.6,1.5,1.4]},"n_failed":0,"failed":[],""" +
      """"variance_flagged":[],"sf":"/root/testdata/sf0.1"}"""

  test("parseBaselineMedians reads the queries map, skips nulls") {
    val m = Bench.parseBaselineMedians(line, "/root/testdata/sf0.1")
    assert(m === Map("q_a" -> 1.5, "q_b" -> 0.25))
  }

  test("a baseline recorded at another scale factor is ignored") {
    assert(Bench.parseBaselineMedians(line, "/root/testdata/sf0.01")
      === Map.empty)
    assert(Bench.parseBaselineMedians("not json at all", "x")
      === Map.empty)
  }

  test("parseBaselineMedians survives a nested object inside queries " +
    "— brace counting, not first-close-brace truncation") {
    val nested =
      """{"metric":"total","value":9.9,"unit":"sec","reps":3,""" +
        """"queries":{"q_a":1.5,"q_meta":{"inner":{"x":1}},"q_b":0.25,""" +
        """"q_esc":"brace } in string","q_c":2.0},""" +
        """"runs":{},"sf":"/root/testdata/sf0.1"}"""
    val m = Bench.parseBaselineMedians(nested, "/root/testdata/sf0.1")
    // every numeric top-level query survives; the old indexOf('}')
    // scan would have stopped at q_meta's inner close brace
    assert(m("q_a") === 1.5)
    assert(m("q_b") === 0.25)
    assert(m("q_c") === 2.0)
  }

  test("healedHeadline: recovery rep within 1.5x of the committed " +
    "median becomes the headline; otherwise the median stands") {
    // contaminated reps, clean recovery → healed to the recovery rep
    assert(Bench.healedHeadline(Seq(6.0, 6.2, 6.1, 1.1), Some(1.1),
      Some(1.0)) === ((1.1, true)))
    // recovery still slow → NOT healed, median keeps the regression
    val (h, ok) = Bench.healedHeadline(Seq(6.0, 6.2, 6.1, 5.9),
      Some(5.9), Some(1.0))
    assert(!ok && h === 6.05)
    // no committed baseline → cannot adjudicate, median stands
    assert(Bench.healedHeadline(Seq(6.0, 1.0), Some(1.0), None)
      === ((3.5, false)))
    // no ok reps at all → failure sentinel
    assert(Bench.healedHeadline(Nil, None, Some(1.0)) === ((-1.0, false)))
  }

  test("a synthetic contaminated run self-heals to within 1.2x of " +
    "the committed baseline total") {
    // 20 queries, committed medians 0.2..4.0s; contention multiplies
    // every rep by 4x (uniform — the shape that poisoned two driver
    // artifacts), recovery reps land at 1.1x of baseline
    val baseline = (1 to 20).map(i => s"q_$i" -> i * 0.2).toMap
    val healedTotal = baseline.map { case (q, b) =>
      val contaminated = Seq(b * 4.0, b * 4.1, b * 3.9)
      // the uniform guard fires (all reps > 3x baseline) → rerun
      assert(Bench.uniformlyAboveBaseline(Some(b), contaminated))
      val recovery = b * 1.1
      val (h, healed) = Bench.healedHeadline(
        contaminated :+ recovery, Some(recovery), Some(b))
      assert(healed, q)
      h
    }.sum
    val committedTotal = baseline.values.sum
    assert(healedTotal <= 1.2 * committedTotal)
  }

  test("uniformlyAboveBaseline: all reps must exceed 3x the median") {
    // uniformly contended: every rep slow, tight spread — flagged
    assert(Bench.uniformlyAboveBaseline(Some(1.0), Seq(3.2, 3.4, 3.3)))
    // one rep at steady state clears the query
    assert(!Bench.uniformlyAboveBaseline(Some(1.0), Seq(3.2, 2.9, 3.3)))
    // no baseline / zero baseline / no reps: never flags
    assert(!Bench.uniformlyAboveBaseline(None, Seq(9.0, 9.0)))
    assert(!Bench.uniformlyAboveBaseline(Some(0.0), Seq(9.0)))
    assert(!Bench.uniformlyAboveBaseline(Some(1.0), Nil))
  }
}
