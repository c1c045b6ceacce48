package graft.chem

import org.scalatest.funsuite.AnyFunSuite

class ChemSpec extends AnyFunSuite {

  private def canon(s: String): String = Smiles.canonical(s)

  test("canonical SMILES is idempotent and input-order independent") {
    val variants = Seq(
      "OCC", "CCO", "C(O)C", // ethanol written three ways
    )
    val canons = variants.map(canon).distinct
    assert(canons.size === 1)
    assert(canon(canons.head) === canons.head)
  }

  test("canonical SMILES distinguishes non-isomorphic molecules") {
    assert(canon("CCO") !== canon("COC"))
    assert(canon("C=O") !== canon("CO"))
    assert(canon("c1ccccc1") !== canon("C1CCCCC1"))
  }

  test("ring + aromatic round trip") {
    val benzene = canon("c1ccccc1")
    assert(canon(benzene) === benzene)
    val phenol = canon("Oc1ccccc1")
    assert(canon("c1ccc(O)cc1") === phenol)
    val naphthalene = canon("c1ccc2ccccc2c1")
    assert(canon(naphthalene) === naphthalene)
  }

  test("charges and brackets survive") {
    assert(canon("[O-]C(=O)C") === canon("CC(=O)[O-]"))
    val m = Smiles.parse("[NH4+]")
    assert(m.atoms.head.charge === 1)
    assert(m.totalH(0) === 4)
  }

  test("stereo is stripped") {
    assert(canon("C[C@@H](N)C(=O)O") === canon("C[C@H](N)C(=O)O"))
    assert(canon("C/C=C/C") === canon("CC=CC"))
  }

  test("formulas (Hill order) and atom counts") {
    assert(Formula.hillFormula(Smiles.parse("O")) === "H2O")
    assert(Formula.hillFormula(Smiles.parse("CCO")) === "C2H6O")
    assert(Formula.hillFormula(Smiles.parse("c1ccccc1")) === "C6H6")
    // ATP (public formula C10H16N5O13P3)
    val atp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)OP(=O)(O)O)C(O)C1O"
    assert(Formula.hillFormula(Smiles.parse(atp)) === "C10H16N5O13P3")
    assert(Formula.parseFormula("C10H16N5O13P3") ===
      Map("C" -> 10, "H" -> 16, "N" -> 5, "O" -> 13, "P" -> 3))
  }

  test("exact masses match public monoisotopic values") {
    assert(math.abs(Formula.exactMass(Smiles.parse("O")) - 18.010565) < 1e-4)
    assert(math.abs(Formula.exactMass(Smiles.parse("CCO")) - 46.041865) < 1e-4)
    assert(math.abs(Formula.exactMass(Smiles.parse("C(=O)=O")) - 43.989829) < 1e-4)
  }

  test("implicit hydrogen model") {
    val m = Smiles.parse("CC(=O)O") // acetic acid
    assert((0 until m.n).map(m.totalH) === Seq(3, 0, 0, 1))
    val pyridine = Smiles.parse("c1ccncc1")
    assert(pyridine.atoms.count(_.elem == "N") === 1)
    assert((0 until 6).map(pyridine.totalH).sum === 5)
    val phosphate = Smiles.parse("OP(=O)(O)O")
    assert((0 until phosphate.n).map(phosphate.totalH).sum === 3)
  }

  test("explicit H round trip") {
    val m = Smiles.parse("CCO").withExplicitH
    assert(m.atoms.count(_.elem == "H") === 6)
    assert(Smiles.write(m) === canon("CCO"))
  }

  test("neutralization") {
    assert(Chem.standardize("CC(=O)[O-]").get === canon("CC(=O)O"))
    assert(Chem.standardize("C[NH3+]").get === canon("CN"))
    assert(Chem.standardize("CC(=O)O.[Na+]") === None) // fragments rejected
  }

  test("aromaticity perception: Kekulé and aromatic forms share identity") {
    def std(s: String) = Chem.standardize(s).get
    assert(std("C1=CC=CC=C1") === std("c1ccccc1")) // benzene
    assert(std("C1=CC=NC=C1") === std("c1ccncc1")) // pyridine
    assert(std("C1=CC=CN1") === std("c1cc[nH]c1")) // pyrrole
    assert(std("C1=CC=CO1") === std("c1ccoc1")) // furan
    assert(std("C1=CC=CS1") === std("c1ccsc1")) // thiophene
    assert(std("C1=CN=CN1") === std("c1c[nH]cn1")) // imidazole
    assert(std("C1=CC=C2C=CC=CC2=C1") === std("c1ccc2ccccc2c1")) // naphthalene
    // NOT aromatic: cyclohexene, cyclohexane stay aliphatic
    assert(std("C1=CCCCC1") !== std("c1ccccc1"))
    assert(std("C1CCCCC1").contains("C1"))
    // exocyclic carbonyl: 2-pyridone is aromatic in the reference model
    assert(std("O=C1C=CC=CN1") === std("O=c1cccc[nH]1"))
  }

  test("fingerprint tanimoto: identical = 1, disjoint-ish < 1") {
    val a = Formula.fingerprint(Smiles.parse("CCO"))
    val b = Formula.fingerprint(Smiles.parse("OCC"))
    val c = Formula.fingerprint(Smiles.parse("c1ccccc1N"))
    assert(Formula.tanimoto(a, b) === 1.0)
    assert(Formula.tanimoto(a, c) < 0.5)
  }

  test("SMARTS atom/bond matching basics") {
    val pat = Smarts.parse("[#6;H2D4:8]")
    val m = Smiles.parse("COP(=O)(O)O").withExplicitH
    // the methyl C has H3, not H2 -> no match on CH3; try ethyl phosphate
    val m2 = Smiles.parse("CCOP(=O)(O)O").withExplicitH
    val hits2 = Smarts.findAll(m2, pat)
    assert(hits2.nonEmpty) // the CH2 bonded to O,C,H,H has D4 H2
    assert(Smarts.findAll(m, pat).isEmpty)
  }

  test("SMARTS X is total connectivity (neighbors + own H), not degree") {
    // Daylight/RDKit X counts hydrogens: ethanol's CH2 is X4 (C,O,H,H)
    // with heavy degree 2 — the old X≈D reading matched nothing here.
    val ethanol = Smiles.parse("CCO")
    val x4c = Smarts.parse("[#6;X4:1]")
    assert(Smarts.findAll(ethanol, x4c).length === 2, "both carbons are X4")
    val x2o = Smarts.parse("[#8;X2:1]")
    assert(Smarts.findAll(ethanol, x2o).length === 1, "hydroxyl O is X2")
    // explicit-H mode: H atoms are graph neighbors; X must not
    // double-count them
    val eh = ethanol.withExplicitH
    assert(Smarts.findAll(eh, x4c).length === 2)
    assert(Smarts.findAll(eh, x2o).length === 1)
    // carbonyl C of acetone: 3 neighbors + 0 H = X3
    val acetone = Smiles.parse("CC(=O)C")
    assert(Smarts.findAll(acetone, Smarts.parse("[#6;X3:1]")).length === 1)
  }

  test("SMARTS bond expressions: ring membership and order ORs") {
    // methylcyclohexane: ring C-C bonds are @, the methyl bond is !@
    val m = Smiles.parse("CC1CCCCC1")
    assert(Smarts.findAll(m, Smarts.parse("[#6]-;@[#6]")).length === 12,
      "6 ring single bonds, both directions")
    assert(Smarts.findAll(m, Smarts.parse("[#6]-;!@[#6]")).length === 2,
      "only the exocyclic methyl bond")
    assert(Smarts.findAll(m, Smarts.parse("[#6]@[#6]")).length === 12)
    // -,: matches single OR aromatic: toluene's exocyclic bond (single)
    // and its 6 aromatic ring bonds all qualify
    val tol = Smiles.parse("Cc1ccccc1")
    assert(Smarts.findAll(tol, Smarts.parse("[#6]-,:[#6]")).length === 14)
    // =;@ — endocyclic double bond only
    val cyclohexenone = Smiles.parse("O=C1CCCC=C1")
    assert(
      Smarts.findAll(cyclohexenone, Smarts.parse("[#6]=;@[#6]")).length
        === 2)
    assert(
      Smarts.findAll(cyclohexenone, Smarts.parse("[#6]=;!@[#8]")).length
        === 1, "the exocyclic carbonyl, one direction from C")
  }

  test("SMARTS ring-size, own-H, valence, and [H] primitives") {
    val m = Smiles.parse("CC1CCCCC1") // 6-ring
    assert(Smarts.findAll(m, Smarts.parse("[#6;r6]")).length === 6)
    assert(Smarts.findAll(m, Smarts.parse("[#6;r5]")).isEmpty)
    assert(Smarts.findAll(m, Smarts.parse("[#6;!r6]")).length === 1,
      "the methyl is in no 6-ring")
    val cp = Smiles.parse("C1CC1CCC1CCCC1") // 3-ring + 5-ring
    assert(Smarts.findAll(cp, Smarts.parse("[#6;r3]")).length === 3)
    assert(Smarts.findAll(cp, Smarts.parse("[#6;r5]")).length === 5)
    // h = OWN hydrogen count; v = valence (bond orders + own H)
    val ethanol = Smiles.parse("CCO")
    assert(Smarts.findAll(ethanol, Smarts.parse("[#6;h3]")).length === 1)
    assert(Smarts.findAll(ethanol, Smarts.parse("[#6;h2]")).length === 1)
    assert(Smarts.findAll(ethanol, Smarts.parse("[#8;v2]")).length === 1)
    assert(Smarts.findAll(ethanol, Smarts.parse("[#6;v4]")).length === 2)
    val amine = Smiles.parse("CN")
    assert(Smarts.findAll(amine, Smarts.parse("[#7v3]")).length === 1)
    // aromatic valences are KEKULIZED totals, not 1.5-rounded sums:
    // every naphthalene carbon (incl. the two fusion carbons with
    // three aromatic bonds) is v4; pyrrole's NH nitrogen is v3;
    // furan's oxygen is v2; pyridine's nitrogen is v3
    val naph = Smiles.parse("c1ccc2ccccc2c1")
    assert(Smarts.findAll(naph, Smarts.parse("[#6;v4]")).length === 10)
    assert(Smarts.findAll(naph, Smarts.parse("[#6;v5]")).isEmpty)
    assert(Smarts.findAll(Smiles.parse("c1cc[nH]c1"),
      Smarts.parse("[#7;v3]")).length === 1)
    assert(Smarts.findAll(Smiles.parse("c1ccoc1"),
      Smarts.parse("[#8;v2]")).length === 1)
    assert(Smarts.findAll(Smiles.parse("c1ccncc1"),
      Smarts.parse("[#7;v3]")).length === 1)
    // [H] as the first primitive is the hydrogen ATOM (explicit-H mode)
    val eh = ethanol.withExplicitH
    assert(Smarts.findAll(eh, Smarts.parse("[H;D1]")).length === 6)
    // chirality primitives are documented no-ops (stereo stripped):
    // [#6;@H2] reduces to [#6;H2] — ethanol's CH2
    assert(Smarts.findAll(ethanol, Smarts.parse("[#6;@H2:1]")).length
      === 1)
    assert(Smarts.findAll(ethanol, Smarts.parse("[#6;@H1:1]")).isEmpty,
      "no #6 with exactly one H in ethanol")
  }

  test("bond-expression parser: and/or logic over order and ring") {
    assert(Smarts.parseBondExpr("-") === Seq((1, 0)))
    assert(Smarts.parseBondExpr("=") === Seq((2, 0)))
    assert(Smarts.parseBondExpr("~") === Seq((5, 0)))
    assert(Smarts.parseBondExpr("@") === Seq((5, 1)))
    assert(Smarts.parseBondExpr("!@") === Seq((5, -1)))
    assert(Smarts.parseBondExpr("-;!@") === Seq((1, -1)))
    assert(Smarts.parseBondExpr("=;@") === Seq((2, 1)))
    assert(Smarts.parseBondExpr("-,:") === Seq((1, 0), (4, 0)))
    assert(Smarts.parseBondExpr("-,:;!@") === Seq((1, -1), (4, -1)))
  }

  test("bond-expression parser: negated order primitives = complement") {
    assert(Smarts.parseBondExpr("!-") ===
      Seq((2, 0), (3, 0), (4, 0)))
    assert(Smarts.parseBondExpr("!=") ===
      Seq((1, 0), (3, 0), (4, 0)))
    assert(Smarts.parseBondExpr("!:") ===
      Seq((1, 0), (2, 0), (3, 0)))
    assert(Smarts.parseBondExpr("!:;@") ===
      Seq((1, 1), (2, 1), (3, 1)))
    // AND with another order primitive INTERSECTS the complement set
    // instead of overwriting it
    assert(Smarts.parseBondExpr("=;!:") === Seq((2, 0)))
    assert(Smarts.parseBondExpr("!-;!=") === Seq((3, 0), (4, 0)))
    assert(Smarts.parseBondExpr("!-!=") === Seq((3, 0), (4, 0)))
    assert(Smarts.parseBondExpr("-;!:") === Seq((1, 0)))
    // contradictions match nothing (empty alternative set)
    assert(Smarts.parseBondExpr("-;=") === Seq.empty)
    assert(Smarts.parseBondExpr("@;!@") === Seq.empty)
    assert(Smarts.parseBondExpr("=;!=") === Seq.empty)
    // !~ matches no bond: rejected with a clear message, not a crash
    val e = intercept[RuntimeException](Smarts.parseBondExpr("!~"))
    assert(e.getMessage.contains("matches no bond"))
    // behavioral: benzene's aromatic ring bonds fail [!:-pattern]
    val benzene = Smiles.parse("c1ccccc1")
    assert(Smarts.findAll(benzene, Smarts.parse("[#6]!:[#6]")).isEmpty)
    assert(Smarts.findAll(benzene, Smarts.parse("[#6]!-[#6]")).nonEmpty)
  }

  test("two-letter H-elements are element queries, not the H atom") {
    // [He], [Hg] must not be rewritten to '#1e'/'#1g' (which crashed);
    // they parse as element-symbol queries and match nothing organic
    val ethanol = Smiles.parse("CCO").withExplicitH
    assert(Smarts.findAll(ethanol, Smarts.parse("[He]")).isEmpty)
    assert(Smarts.findAll(ethanol, Smarts.parse("[Hg]")).isEmpty)
    // while [H;D1] still hits the explicit hydrogens (the special case)
    assert(Smarts.findAll(ethanol, Smarts.parse("[H;D1]")).nonEmpty)
  }

  test("SMARTS recursive $(...) anchors at the bracket atom") {
    // carboxylic acid C via recursion: C(=O)O pattern anchored at C
    val acid = Smiles.parse("CCC(=O)O")
    val pat = Smarts.parse("[$([#6](=[#8])[#8])]")
    val hits = Smarts.findAll(acid, pat)
    assert(hits.length === 1)
    assert(hits.head(0) === 2, "anchored at the carboxyl carbon")
    // the same sub-pattern does NOT match the plain chain carbons
    assert(Smarts.findAll(Smiles.parse("CCC"), pat).isEmpty)
  }

  test("SMARTS OR-of-AND groups") {
    // [#7;R0;H2D3,H3D4:1] — N not in ring with (H2,D3) or (H3,D4)
    val pat = Smarts.parse("[#7;R0;H2D3,H3D4:1]")
    val amine = Smiles.parse("CCN").withExplicitH // N: H2, D3 (C,H,H)
    assert(Smarts.findAll(amine, pat).nonEmpty)
    val aromaticN = Smiles.parse("c1ccncc1").withExplicitH
    assert(Smarts.findAll(aromaticN, pat).isEmpty)
  }

  test("2.7.1.a phosphorylation: ATP + ethanol -> phospho + ADP") {
    val smarts = "[#6;H2D4:8][#8;H0D2:7][#15;H0D4:6][#8;H0D2:5]" +
      "[#15;H0D4:4][#8;H0D2:3][#15;H0D4:2][#8;H1D2R0:1]." +
      "[#1;D1R0:11][#8;H1D2R0:10][#6:9]>>" +
      "[*:1]-[*:2]-[*:10]-[*:9].[*:8]-[*:7]-[*:6]-[*:5]-[*:4]-[*:3]-[*:11]"
    val rule = ReactionRule.parse(smarts)
    val atp = Smiles.parse(
      "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)OP(=O)(O)O)C(O)C1O").withExplicitH
    val ethanol = Smiles.parse("CCO").withExplicitH
    val results = ReactionRule.run(rule, Seq(atp, ethanol))
    assert(results.nonEmpty)
    val productSets = results.map(_.map(Smiles.write).sorted).distinct
    // every product set: ethyl-phosphate-adenosine-diphosphate split:
    // one product contains the new C-O-P bond, the other is ADP
    val adp = Smiles.canonical(
      "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)O)C(O)C1O")
    assert(productSets.exists(_.contains(adp)),
      s"expected ADP in $productSets")
    // balance: ATP + ethanol = products
    for (ps <- results) {
      assert(Chem.isBalanced(
        Seq(1 -> atp, 1 -> ethanol), ps.map(1 -> _)))
    }
  }
}
