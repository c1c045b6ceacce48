package graft.chem

import org.scalatest.funsuite.AnyFunSuite

class KekulizeSpec extends AnyFunSuite {
  private def mol(s: String) = Smiles.parse(s)

  test("valid aromatics kekulize") {
    assert(Kekulize.kekulizable(mol("c1ccccc1")))           // benzene
    assert(Kekulize.kekulizable(mol("c1ccncc1")))           // pyridine
    assert(Kekulize.kekulizable(mol("c1cc[nH]c1")))         // pyrrole
    assert(Kekulize.kekulizable(mol("c1ccoc1")))            // furan
    assert(Kekulize.kekulizable(mol("c1ccsc1")))            // thiophene
    assert(Kekulize.kekulizable(mol("Nc1ncnc2c1nc[nH]2")))  // adenine
    assert(Kekulize.kekulizable(mol("O=c1cc[nH]c(=O)[nH]1"))) // uracil
    assert(Kekulize.kekulizable(mol("c1ccc2ccccc2c1")))     // naphthalene
    assert(Kekulize.kekulizable(mol("CCO")))                // no aromatics
  }

  test("pi-deficient aromatics are rejected") {
    // adenine missing the N9 hydrogen: 9 needs-1 atoms in a system that
    // cannot pair them all -> the round-2 radical fragment class
    assert(!Kekulize.kekulizable(mol("c1nc2c(N)ncnc2n1")))
    // pyridine N with an extra substituent but no charge: need < 0
    assert(!Kekulize.kekulizable(mol("Cn1ccccc1")))
    // N-methylpyridinium IS valid
    assert(Kekulize.kekulizable(mol("C[n+]1ccccc1")))
  }

  test("assignment returns a concrete alternating Kekulé matching") {
    val benzene = mol("c1ccccc1")
    val Some(doubled) = Kekulize.assignment(benzene)
    assert(doubled.size === 3, "benzene carries exactly 3 double bonds")
    // the matching is a perfect pairing: every atom touched exactly once
    val touched = doubled.toSeq.flatMap { bi =>
      Seq(benzene.bonds(bi).a, benzene.bonds(bi).b) }
    assert(touched.distinct.length === 6)
    // pyrrole: N contributes the lone pair, only 2 doubles
    val Some(d2) = Kekulize.assignment(mol("c1cc[nH]c1"))
    assert(d2.size === 2)
    assert(Kekulize.assignment(mol("c1nc2c(N)ncnc2n1")).isEmpty)
    assert(Kekulize.assignment(mol("CCO")) === Some(Set.empty[Int]))
  }

  test("RdkitValence.sanitizeOk: strict valence over the assignment") {
    assert(RdkitValence.sanitizeOk(mol("c1ccccc1")))
    assert(RdkitValence.sanitizeOk(mol("Nc1ncnc2c1nc[nH]2")))
    assert(RdkitValence.sanitizeOk(mol("CC(=O)[O-]")))
    assert(RdkitValence.sanitizeOk(mol("C[n+]1ccccc1")))
    assert(RdkitValence.sanitizeOk(mol("COP(=O)(O)OC")))
    // unkekulizable -> rejected
    assert(!RdkitValence.sanitizeOk(mol("c1nc2c(N)ncnc2n1")))
    // bracket-fixed over-valent atoms -> rejected (RDKit "Explicit
    // valence greater than permitted")
    assert(!RdkitValence.sanitizeOk(mol("C[NH4]")))  // 5-valent N0
    assert(!RdkitValence.sanitizeOk(mol("CO(C)C")))  // 3-bonded O0
    // the charged forms are fine
    assert(RdkitValence.sanitizeOk(mol("C[NH3+]")))
    assert(RdkitValence.sanitizeOk(mol("C[OH2+]")))
    // anionic O may carry at most one bond
    assert(RdkitValence.sanitizeOk(mol("CC([O-])=O")))
    assert(!RdkitValence.sanitizeOk(mol("C[O-]C")))
    // boron sits LEFT of carbon: the anion GAINS a valence slot
    assert(RdkitValence.sanitizeOk(mol("[BH4-]"))) // borohydride
    assert(RdkitValence.sanitizeOk(mol("OB(O)O"))) // boric acid
    assert(!RdkitValence.sanitizeOk(mol("CB(C)(C)C"))) // 4-valent B0
    // S+ shifts isoelectronically to P: max 5 — sulfonium ok,
    // 6-valent S+ rejected (neutral 6-valent S still fine)
    assert(RdkitValence.sanitizeOk(mol("C[S+](C)C"))) // sulfonium
    assert(RdkitValence.sanitizeOk(mol("OS(=O)(=O)O"))) // sulfate 6
    assert(!RdkitValence.sanitizeOk(mol("C[S+](=O)(=O)O"))) // 6-valent S+
    // charged halogens: X- is valence 0 (free anion only), X+ is the
    // 2-valent halonium
    assert(RdkitValence.sanitizeOk(mol("[Cl-]")))
    assert(!RdkitValence.sanitizeOk(mol("C[Cl-]"))) // bonded Cl-
    assert(RdkitValence.sanitizeOk(mol("C[Cl+]C"))) // chloronium
    assert(!RdkitValence.sanitizeOk(mol("C[Cl+](C)C"))) // 3-valent Cl+
  }
}
