package graft.chem

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bit-exact RDKFingerprint replica (RdkFp). The doctest
  * ratios come from RDKit's own documentation ("Getting Started",
  * fingerprinting section); the remaining tests pin determinism and
  * the subgraph-enumeration surface so hash regressions are loud.
  */
class RdkFpSpec extends AnyFunSuite {

  private def fp(s: String) = RdkFp.bits(Smiles.parse(s))
  private def tani(a: Array[Int], b: Array[Int]): Double = {
    val sa = a.toSet; val sb = b.toSet
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("RDKit doctest ratios: CCOC/CCO/COC -> 0.6 / 0.4 / 0.25") {
    val (x, y, z) = (fp("CCOC"), fp("CCO"), fp("COC"))
    assert(tani(x, y) === 0.6)
    assert(tani(x, z) === 0.4)
    assert(tani(y, z) === 0.25)
  }

  test("identical molecules give identical fingerprints across writes") {
    val a = fp("OCC1OC(O)C(O)C(O)C1O")
    val b = fp(Smiles.write(Smiles.parse("C1(C(C(C(C(CO)O1)O)O)O)O")))
    assert(tani(a, b) === 1.0)
  }

  test("subgraph counts: n-bond subgraphs set <= 2 bits each") {
    // propane: bonds C-C,C-C; subgraphs {b0},{b1},{b0,b1} -> <=6 bits
    val p = fp("CCC")
    assert(p.length <= 6 && p.length >= 3)
    // single bond: exactly one subgraph -> <= 2 bits
    assert(fp("CC").length <= 2)
  }

  test("aromatic and aliphatic rings fingerprint differently") {
    assert(tani(fp("c1ccccc1"), fp("C1CCCCC1")) < 0.5)
  }

  test("invariance under atom relabeling") {
    val s = "O=C(O)CCC(=O)OP(=O)(O)OCC1OC(n2ccccc2)C(O)C1O"
    val m = Smiles.parse(s)
    val base = RdkFp.bits(m).toSeq
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 3) {
      val perm = rng.shuffle((0 until m.n).toVector)
      val inv = Array.ofDim[Int](m.n)
      perm.zipWithIndex.foreach { case (p, i) => inv(p) = i }
      val atoms2 = perm.map(m.atoms)
      val bonds2 = m.bonds.map(b => b.copy(a = inv(b.a), b = inv(b.b)))
      assert(RdkFp.bits(new Molecule(atoms2, bonds2)).toSeq === base)
    }
  }

  test("mt19937 reference vector (seed 5489 first outputs)") {
    // standard MT19937 test vector: with the default seed 5489 the
    // first outputs are 3499211612, 581869302, 3890346734
    val rng = new RdkFp.Mt19937(5489L)
    assert(rng.next() === 3499211612L)
    assert(rng.next() === 581869302L)
    assert(rng.next() === 3890346734L)
  }

  test("boost classic hash_combine chain is stable") {
    // seed 0 combined with {1,2}: classic formula on 64-bit size_t
    val h = RdkFp.boostHashRange(Array(1L, 2L))
    val s1 = 0L ^ (1L + 0x9e3779b9L + 0L + 0L)
    val s2 = s1 ^ (2L + 0x9e3779b9L + (s1 << 6) + (s1 >>> 2))
    assert(h === s2)
  }
}
