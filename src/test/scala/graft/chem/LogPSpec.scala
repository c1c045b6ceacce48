package graft.chem

import org.scalatest.funsuite.AnyFunSuite

class LogPSpec extends AnyFunSuite {

  private def lp(s: String) = Formula.logPEstimate(Smiles.parse(s))

  test("deterministic and representation-invariant") {
    assert(lp("CCO") === lp("OCC"))
  }

  test("sign conventions: hydrocarbons positive, polyols negative") {
    assert(lp("CCCCCCCC") > 0) // octane
    assert(lp("OCC(O)C(O)C(O)C(O)CO") < 0) // sorbitol
    // adding a CH2 raises logP; adding an OH lowers it
    assert(lp("CCCCC") > lp("CCCC"))
    assert(lp("CCO") < lp("CC"))
  }

  test("glucose lands in the reference's ballpark (Crippen -3.22)") {
    val g = lp("OCC1OC(O)C(O)C(O)C1O")
    assert(g < -1.5 && g > -5.0)
  }
}
