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
