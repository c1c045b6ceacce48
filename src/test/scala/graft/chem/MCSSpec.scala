package graft.chem

import org.scalatest.funsuite.AnyFunSuite

class MCSSpec extends AnyFunSuite {

  private def score(a: String, b: String): Double =
    MCS.mcsScore(Smiles.parse(a), Smiles.parse(b))

  test("identical molecules score 1.0") {
    assert(score("CCO", "CCO") === 1.0)
    assert(score("c1ccccc1", "c1ccccc1") === 1.0)
  }

  test("substructure scores the full target when target is contained") {
    // target ethanol inside propanol: mcs = ethanol itself
    assert(score("CCCO", "CCO") === 1.0)
    // reversed: propanol target, ethanol compound: 5 of 7 (3 atoms+2 bonds)
    assert(score("CCO", "CCCO") === 5.0 / 7.0)
  }

  test("partial overlap scores between 0 and 1, symmetric trend") {
    val s = score("CCCCN", "CCCCO") // common CCCC chain: 4 atoms+3 bonds of 9
    assert(s === 7.0 / 9.0)
  }

  test("aromatic does not match aliphatic") {
    assert(score("c1ccccc1", "C1CCCCC1") === 0.0)
  }

  test("deterministic under atom reordering") {
    assert(score("OCC", "CCCO") === score("CCO", "CCCO"))
  }

  test("budget caps work on bigger molecules (lower bound, no hang)") {
    val atp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)OP(=O)(O)O)C(O)C1O"
    val adp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)O)C(O)C1O"
    val t0 = System.nanoTime()
    val s = MCS.mcsScore(Smiles.parse(atp), Smiles.parse(adp), budget = 5000)
    assert((System.nanoTime() - t0) / 1e9 < 30)
    assert(s > 0.3 && s <= 1.0)
  }
}
