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
}
