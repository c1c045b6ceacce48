package graft.chem

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exact NP-likeness parity against the reference: the shipped
  * model (`publicnp.model.gz`) is loaded with the pure-Scala unpickler
  * and every NP_likeness value the reference ships in
  * tests/data/testing_db.json must be reproduced to 1e-9 — which pins
  * the whole chain: pickle decode, RDKit-exact Morgan radius-2 bit ids
  * (invariants, boost hashing, environment dedup), and the npscorer
  * sum/normalize/damp pipeline.
  */
class NPScoreParitySpec extends AnyFunSuite {

  private val modelPath =
    "/root/reference/minedatabase/NP_Score/publicnp.model.gz"
  private def present = Files.exists(Paths.get(modelPath))

  private lazy val model: Map[Long, Double] = NPModel.load(modelPath)

  // every (SMILES, NP_likeness) pair in the reference's
  // tests/data/testing_db.json (26 distinct SMILES)
  private val oracles: Seq[(String, Double)] = Seq(
    ("C=Cc1c2[nH]c(c1C)Cc1[nH]c(c(CCC(=O)O)c1C)Cc1[nH]c(c(C)c1CCC(=O)O)Cc1[nH]c(c(C)c1C=C)C2", 0.1735557228751048),
    ("CC(O)=NC1=COC(CO)C(OC2OC(CO)C(OC3OC(CO)C(OC4OC(CO)C(O)C(O)C4N=C(C)O)C(OC(C)C(O)=NC(C)C(O)=NC(CCC(=O)O)C(O)=NC(CCCC(N)C(=O)O)C(O)=NC(C)C(=O)O)C3N=C(C)O)C(O)C2N=C(C)O)C1OC(C)C(O)=NC(C)C(O)=NC(CCC(=O)O)C(O)=NC(CCCC(N)C(=O)O)C(O)=NC(C)C(=O)O", 0.4852195413149079),
    ("CCC(=O)C(=O)O", 0.6456472397879001),
    ("CCCCCCCCCCCCC[C@H](O)CC(=O)SCCN=C(O)CCN=C(O)[C@H](O)C(C)(C)COP(=O)(O)OP(=O)(O)OC[C@H]1O[C@@H](n2cnc3c(N)ncnc32)[C@H](O)[C@@H]1OP(=O)(O)O", 0.7183003835027104),
    ("CCCCCCCCCCC[C@@H](O)CC(=O)O[C@H]1[C@H](O)[C@@H](CO)O[C@@H](OC[C@H]2O[C@H](OP(=O)(O)O)[C@H](N=C(O)C[C@H](O)CCCCCCCCCCC)[C@@H](OC(=O)C[C@H](O)CCCCCCCCCCC)[C@@H]2O)[C@@H]1N=C(O)C[C@H](O)CCCCCCCCCCC", 0.6767933721874979),
    ("CSCC[C@@H](N)C(=O)O", 0.3428285563410889),
    ("C[C@H](N)C(O)=N[C@@H](CCC(=O)O)C(=O)O", 0.6685388247424201),
    ("Cc1cc2c(cc1C)N(CC(O)C(O)C(COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)OP(=O)(O)O)c1nc(O)nc(O)c1N2", 0.6309896541071534),
    ("Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2", 0.7241478218305234),
    ("Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(OP(=O)(O)O)c1N2", 0.7336433589874692),
    ("Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(OP(=O)(O)O)nc(O)c1N2", 0.7683595016208552),
    ("Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1OP(=O)(O)O)c1nc(O)nc(O)c1N2", 0.7047218787838551),
    ("Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(OP(=O)(O)O)C1O)c1nc(O)nc(O)c1N2", 0.7550818503254341),
    ("Cc1cc2c(cc1C)N(CC(O)C(OP(=O)(O)O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2", 0.6287784876436445),
    ("Cc1cc2c(cc1C)N(CC(OP(=O)(O)O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2", 0.6889059022834692),
    ("Cc1ncc(CO)c(=N)[nH]1", -0.14759583553769),
    ("Cc1ncc(COP(=O)(O)O)c(C=O)c1O", 0.8456668322114251),
    ("N#CS", -1.160918242658),
    ("NCCCC=O", 1.953252287376267),
    ("NCCc1ccc(O)cc1", 0.7583377613514001),
    ("Nc1ncnc2c1ncn2[C@@H]1O[C@H](COP(=O)(O)OP(=O)(O)O)[C@@H](O)[C@H]1O", 1.3883535027781002),
    ("Nc1ncnc2c1ncn2[C@@H]1O[C@H](COP(=O)(O)OP(=O)(O)OP(=O)(O)O)[C@@H](O)[C@H]1O", 1.3438955794867324),
    ("O=P(O)(O)O", 0.55681946539022),
    ("O=P(O)(O)O[C@H]1O[C@H](CO)[C@H](O)[C@H](O)[C@H]1O", 2.150848501723131),
    ("OC[C@H]1OC(O)[C@H](O)[C@@H](O)[C@@H]1O", 2.62691337083175),
    ("OC[C@H]1OC(O)[C@H](O)[C@H](O)[C@@H]1O", 2.62691337083175))

  test("unpickler reads the shipped model") {
    assume(present)
    assert(model.size === 266104)
    assert(math.abs(model(2115502080L) - 0.53742392198) < 1e-12)
    assert(math.abs(model(1875902468L) - 1.79269642708) < 1e-12)
  }

  test("all 26 shipped NP_likeness values reproduce to 1e-9") {
    assume(present)
    val sc = NPScore.scorer(model)
    val bad = oracles.flatMap { case (smiles, want) =>
      val got = sc(Smiles.parse(smiles))
      if (math.abs(got - want) < 1e-9) None
      else Some(s"$smiles: got $got want $want")
    }
    assert(bad.isEmpty, "NP parity broken:\n" + bad.mkString("\n"))
  }

  test("stub model path still deterministic and bounded") {
    val s1 = NPScore.score("CCO")
    assert(s1 === NPScore.score("OCC"))
    assert(math.abs(s1) <= 5.0)
  }
}
