package graft.chem

import org.scalatest.funsuite.AnyFunSuite

/** InChI ingest (S2): reconstruction must land on the SAME canonical
  * SMILES (and so the same compound id) as the equivalent SMILES input.
  */
class InChISpec extends AnyFunSuite {

  private def canonOfSmiles(s: String): String = Chem.standardize(s).get
  private def canonOfInchi(i: String): String =
    Chem.standardize(InChI.toCanonicalSmiles(i).get).get

  test("ethanol, acetic acid: chains with fixed and mobile H") {
    assert(canonOfInchi("InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3") ===
      canonOfSmiles("CCO"))
    // mobile (H,3,4): deterministic assignment to the first listed O
    assert(canonOfInchi("InChI=1S/C2H4O2/c1-2(3)4/h1H3,(H,3,4)") ===
      canonOfSmiles("CC(=O)O"))
  }

  test("glucose ring: branches + ring closure, all-single bonds") {
    assert(canonOfInchi(
      "InChI=1S/C6H12O6/c7-1-2-3(8)4(9)5(10)6(11)12-2/h2-11H,1H2") ===
      canonOfSmiles("OCC1OC(O)C(O)C(O)C1O"))
  }

  test("benzene and pyridine: deficiency matching recovers alternation " +
    "and aromatization matches the SMILES form") {
    assert(canonOfInchi("InChI=1S/C6H6/c1-2-4-6-5-3-1/h1-6H") ===
      canonOfSmiles("c1ccccc1"))
    assert(canonOfInchi("InChI=1S/C5H5N/c1-2-4-6-5-3-1/h1-5H") ===
      canonOfSmiles("c1ccncc1"))
  }

  test("carbonyls and nitriles: double/triple bond recovery") {
    assert(canonOfInchi("InChI=1S/C3H6O/c1-3(2)4/h1-2H3") ===
      canonOfSmiles("CC(C)=O")) // acetone
    assert(canonOfInchi("InChI=1S/C2H3N/c1-2-3/h1H3") ===
      canonOfSmiles("CC#N")) // acetonitrile
  }

  test("phosphate: P valence expansion absorbs the O deficit") {
    // dimethyl phosphate-ish: trimethyl phosphate PO(OC)3
    assert(canonOfInchi(
      "InChI=1S/C3H9O4P/c1-5-8(4,6-2)7-3/h1-3H3") ===
      canonOfSmiles("COP(=O)(OC)OC"))
  }

  test("unsupported layers are rejected, not mangled") {
    assert(InChI.parse("InChI=1S/C2H6O.H2O/c1-2-3;/h3H,2H2,1H3;1H2").isEmpty)
    assert(InChI.parse("InChI=1S/C2H3O2/c1-2(3)4/h1H3/q-1").isEmpty)
    assert(InChI.parse("not an inchi").isEmpty)
  }

  test("loadCompoundFile ingests a mixed SMILES/InChI column") {
    val spark = graft.SparkSuite.session
    val p = "/tmp/graft_inchi_compounds.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "id,smiles\n" +
        "a,CCO\n" +
        "b,\"InChI=1S/C6H12O6/c7-1-2-3(8)4(9)5(10)6(11)12-2/h2-11H,1H2\"\n" +
        "c,\"InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3\"\n") // c == a after canon
    val df = graft.pickaxe.PickaxeEngine.loadCompoundFile(spark, p)
    assert(df.count() === 2) // ethanol (deduped) + glucose
    val ids = df.select("_id").collect().map(_.getString(0)).toSet
    assert(ids.contains(
      Chem.compoundHash(Chem.standardize("OCC1OC(O)C(O)C(O)C1O").get, 'C')))
  }
}
