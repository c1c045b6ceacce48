package graft.chem

import org.scalatest.funsuite.AnyFunSuite

/** The skeleton key must reproduce the InChIKey-first-block merging
  * semantics the reference's compound ids inherit (utils.py:115-164):
  * mobile-H tautomers, protonation states, and bond-order-only
  * rearrangements collapse; constitutional isomers stay apart.
  */
class InChISkeletonSpec extends AnyFunSuite {

  private def k(s: String) = InChISkeleton.key(Smiles.parse(s))

  test("amide and imidic acid merge (1,3 mobile H over N-C=O)") {
    assert(k("CC(=O)N") === k("CC(O)=N"))
  }

  test("carboxylate and acid merge (proton normalization)") {
    assert(k("CC(=O)[O-]") === k("CC(=O)O"))
  }

  test("amidine tautomers merge") {
    assert(k("CC(=N)N") === k("CC(N)=N"))
  }

  test("1,5-shift enol chain merges") {
    // O=C-C=C-OH <-> HO-C=C-C=O across a conjugated chain
    assert(k("O=CC=CO") === k("OC=CC=O"))
  }

  test("phosphate O-H permutations merge through the P center") {
    assert(k("COP(=O)(O)O") === k("COP(O)(=O)O"))
  }

  test("keto-enol does NOT merge (H moves to carbon)") {
    assert(k("CC(=O)C") !== k("CC(O)=C"))
  }

  test("positional carbonyl isomers stay distinct") {
    // 2- vs 3-oxo on an asymmetric chain: different /h layers.
    // (NOT OCC(=O)C(O)CO vs OCC(O)C(=O)CO — those are the same
    // molecule read from opposite chain ends.)
    assert(k("CCC(=O)C(O)C") !== k("CCC(O)C(=O)C"))
  }

  test("same molecule written two ways agrees") {
    assert(k("COCCO") === k("OCCOC"))
  }

  test("charge-separated and neutral nitro writings merge (net-0 " +
    "zwitterions get NO phantom proton)") {
    assert(k("C[N+](=O)[O-]") === k("CN(=O)=O"))
    // and the anion of a DIFFERENT group still protonates: net charge,
    // not per-atom charge, drives /p (real InChI semantics)
    assert(k("CC(=O)[O-]") === k("CC(=O)O"))
  }

  test("4-pyridone and 4-hydroxypyridine merge (mobile H through an " +
    "aromatic ring path)") {
    assert(k("Oc1ccncc1") === k("O=C1C=CNC=C1"))
  }

  test("7H- and 9H-purine merge (the adenine-scaffold tautomerism " +
    "the reference's InChI ids fold)") {
    assert(k("c1ncc2[nH]cnc2n1") === k("c1ncc2nc[nH]c2n1"))
    // and the mobile group spans all four ring nitrogens
    val key = k("c1ncc2[nH]cnc2n1")
    assert(key.endsWith(")") && key.contains("(H1,"),
      s"expected one mobile-H group over the N set: $key")
  }

  test("WL-ambiguous symmetric cages: key invariant under relabeling") {
    // cubane is 3-regular and vertex-transitive — WL leaves ALL eight
    // carbons in one cell, so the orbit tie-break must branch over
    // every candidate and take the lexicographic minimum; the old
    // min-INDEX individualization was input-order-dependent here
    for (s <- Seq("C12C3C4C1C5C2C3C45", // cubane
      "C1C2CC3CC1CC(C2)C3")) { // adamantane
      val m = Smiles.parse(s)
      val rng = new scala.util.Random(13)
      val base = InChISkeleton.key(m)
      for (_ <- 0 until 8) {
        val perm = rng.shuffle((0 until m.n).toVector)
        val inv = Array.ofDim[Int](m.n)
        perm.zipWithIndex.foreach { case (p, i) => inv(p) = i }
        val atoms2 = perm.map(m.atoms)
        val bonds2 = m.bonds.map(b => b.copy(a = inv(b.a), b = inv(b.b)))
        assert(InChISkeleton.key(new Molecule(atoms2, bonds2)) === base,
          s"relabeled $s changed key")
      }
    }
  }

  test("key is invariant under atom relabeling") {
    val s = "O=C(O)CCC(=O)OP(=O)(O)OCC1OC(n2ccccc2)C(O)C1O"
    val m = Smiles.parse(s)
    val rng = new scala.util.Random(7)
    val base = InChISkeleton.key(m)
    for (_ <- 0 until 5) {
      val perm = rng.shuffle((0 until m.n).toVector)
      val inv = Array.ofDim[Int](m.n)
      perm.zipWithIndex.foreach { case (p, i) => inv(p) = i }
      val atoms2 = perm.map(m.atoms)
      val bonds2 = m.bonds.map(b => b.copy(a = inv(b.a), b = inv(b.b)))
      assert(InChISkeleton.key(new Molecule(atoms2, bonds2)) === base)
    }
  }
}
