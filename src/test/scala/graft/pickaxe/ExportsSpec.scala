package graft.pickaxe

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.chem.{MolFile, Smiles}

/** Export surface (SBML pickaxe.py:1244-1476; SDF/MOL/SMILES
  * compound_io.py:16-151; KBase compound_io.py:243-346), thermo /
  * feasibility filters, and the mzXML reader.
  */
class ExportsSpec extends SparkSuite {
  import spark.implicits._

  private val atp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)OP(=O)(O)O)C(O)C1O"
  private val adp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)O)C(O)C1O"
  private val fadh = "Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC" +
    "(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2"
  private val rule = "[#6;H2D4:8][#8;H0D2:7][#15;H0D4:6][#8;H0D2:5]" +
    "[#15;H0D4:4][#8;H0D2:3][#15;H0D4:2][#8;H1D2R0:1]." +
    "[#1;D1R0:11][#8;H1D2R0:10][#6:9]>>" +
    "[*:1]-[*:2]-[*:10]-[*:9].[*:8]-[*:7]-[*:6]-[*:5]-[*:4]-[*:3]-[*:11]"

  private lazy val engine = {
    val core = PickaxeEngine.parseCoreactants(Seq(
      s"ATP\tATP\t$atp", s"ADP\tADP\t$adp"))
    new PickaxeEngine(spark,
      PickaxeEngine.parseRules(Seq(s"2.7.1.a\tATP;Any\t$rule\tAny;ADP\t-"),
        core), core, explicitH = true)
  }
  private lazy val st = engine.run(Seq(fadh), generations = 2)

  test("SBML export: well-formed XML with all species/reactions, " +
    "deterministic across runs") {
    val f1 = "/tmp/graft_sbml_a.sbml"; val f2 = "/tmp/graft_sbml_b.sbml"
    Exports.writeSbml(st, f1)
    Exports.writeSbml(st, f2)
    val xmlText = Files.readString(Paths.get(f1))
    assert(xmlText === Files.readString(Paths.get(f2))) // byte-deterministic
    val root = scala.xml.XML.loadString(xmlText) // parses = well-formed
    assert(root.label === "sbml")
    val species = root \\ "species"
    val rxns = root \\ "reaction"
    assert(species.length === st.compounds.count()) // 31
    assert(rxns.length === st.reactions.count()) // 49
    // species annotated with SMILES + type; reactions with operator
    assert((root \\ "smiles").nonEmpty)
    assert((root \\ "operator").map(_.text).forall(_.contains("2.7.1.a")))
    // every speciesReference resolves to a declared species id
    val ids = species.map(_ \@ "id").toSet
    val refs = (root \\ "speciesReference").map(_ \@ "species").toSet
    assert(refs.subsetOf(ids))
  }

  test("MOL/SDF export round-trips through the MOL parser") {
    val dir = "/tmp/graft_mols"
    Exports.writeMolDir(st, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".mol"))
    assert(files.length === st.compounds
      .where(col("_id").startsWith("C")).count())
    // round-trip: mol file -> parse+perceive -> canonical SMILES -> same _id
    files.foreach { f =>
      val smi = MolFile.molToSmiles(Files.readString(f.toPath))
      val canon = graft.chem.Chem.standardize(smi)
      assert(canon.isDefined)
      val id = graft.chem.Chem.compoundHash(canon.get, 'C')
      assert(f.getName === s"$id.mol",
        s"round-trip id mismatch for ${f.getName}")
    }
    val sdf = "/tmp/graft_export.sdf"
    Exports.writeSdf(engine, st, sdf)
    val recs = MolFile.parseSdf(Files.readString(Paths.get(sdf)))
    assert(recs.length === st.compounds.count())
    assert(recs.forall(_._2.contains("_id")))
    assert(recs.forall(_._2.contains("Generation")))
  }

  test("SMILES TSV and KBase export shapes") {
    val smi = "/tmp/graft_export.smiles"
    Exports.writeSmilesTsv(engine, st, smi)
    val lines = Files.readAllLines(Paths.get(smi))
    assert(lines.get(0) === "SMILES\t_id\tGeneration\tReactant_in\tProduct_of")
    assert(lines.size() === st.compounds.count() + 1)

    Exports.writeKbase(st, "/tmp/graft_kbase", "testmine")
    val cpds = Files.readAllLines(Paths.get("/tmp/graft_kbase/testmine_compounds.tsv"))
    val rxns = Files.readAllLines(Paths.get("/tmp/graft_kbase/testmine_reactions.tsv"))
    assert(cpds.get(0) === "id\tname\tformula\tcharge\taliases")
    // X-compounds skipped (2 coreactants)
    assert(cpds.size() === st.compounds.count() - 2 + 1)
    assert(rxns.size() === st.reactions.count() + 1)
    assert(rxns.get(1).split("\t").length === 9)
    assert(rxns.get(1).contains(" => "))
    assert(!rxns.get(1).contains("X")) // X->C rewrite in equations
  }

  test("SBML and KBase exports match their golden sha256 pins") {
    // Byte-level fidelity pins over the deterministic 2-gen FADH fixture
    // (31 compounds / 49 reactions, content-hash ids): any change to the
    // export serialization — element order, attributes, equation text —
    // must be a conscious one that re-pins these.
    def sha256(p: String): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(Files.readAllBytes(Paths.get(p)))
      d.map("%02x".format(_)).mkString
    }
    val sbml = "/tmp/graft_sbml_golden.sbml"
    Exports.writeSbml(st, sbml)
    Exports.writeKbase(st, "/tmp/graft_kbase_golden", "golden")
    val got = Map(
      "sbml" -> sha256(sbml),
      "kbase_compounds" ->
        sha256("/tmp/graft_kbase_golden/golden_compounds.tsv"),
      "kbase_reactions" ->
        sha256("/tmp/graft_kbase_golden/golden_reactions.tsv"))
    val pinned = Map(
      "sbml" -> "431efef2ea23b6b5a27f7fe2d070583fbb8c00d4d01f87c5bb3bd28e3528c560",
      "kbase_compounds" -> "6a3ecf66acadbec470deec0c563121fd065b0740b69b0ab073b6cb6ee274eeef",
      "kbase_reactions" -> "a3f3a0960dfdbed794e8f4afdde4fc68d9a41d7f5f2bafe08fa276af1680f3f4")
    assert(got === pinned, s"golden export drift: $got")
  }

  test("ThermoFilter deletes endergonic reactions; permissive max passes") {
    // dgMax very large: nothing removed
    val pass = engine.run(Seq(fadh), 1,
      filters = Seq(ThermoFilter(dgMax = 1e7)))
    assert(pass.reactions.count() > 0)
    // dgMax very negative: every gen-producing reaction removed, and the
    // orphan cascade removes the now-unproduced gen-1 compounds
    val block = engine.run(Seq(fadh), 2,
      filters = Seq(ThermoFilter(dgMax = -1e7)))
    assert(block.reactions.count() === 0)
    assert(block.compounds.where(col("Type") === "Predicted").count() === 0)
  }

  test("FeasibilityFilter gates on the scorer at the 0.32 threshold") {
    val none = engine.run(Seq(fadh), 1,
      filters = Seq(FeasibilityFilter(scorer = (_, _) => 1.0)))
    assert(none.reactions.count() > 0)
    val all = engine.run(Seq(fadh), 2,
      filters = Seq(FeasibilityFilter(scorer = (_, _) => 0.0)))
    assert(all.reactions.count() === 0)
    // deterministic stub is stable and in [0,1)
    val s1 = FeasibilityFilter.deterministicStub(Seq("CCO"), Seq("CC=O"))
    assert(s1 === FeasibilityFilter.deterministicStub(Seq("CCO"), Seq("CC=O")))
    assert(s1 >= 0.0 && s1 < 1.0)
  }

  test("mzXML reader: msLevel-2 scans become peaks " +
    "(metabolomics.py:827-857)") {
    val xml =
      """<?xml version="1.0" encoding="ISO-8859-1"?>
        |<mzXML xmlns="http://sashimi.sourceforge.net/schema_revision/mzXML_3.2">
        | <msRun scanCount="3">
        |  <scan num="1" msLevel="1" retentionTime="PT0.4S" polarity="+">
        |  </scan>
        |  <scan num="2" msLevel="2" retentionTime="PT1.5S" polarity="+">
        |   <precursorMz precursorIntensity="100">253.09337</precursorMz>
        |  </scan>
        |  <scan num="3" msLevel="2" retentionTime="PT2.25S" polarity="-">
        |   <precursorMz precursorIntensity="50">115.00478</precursorMz>
        |  </scan>
        | </msRun>
        |</mzXML>""".stripMargin
    val peaks = SpectraIO.parseMzxml(xml)
    assert(peaks.length === 2)
    assert(peaks(0).mz === 253.09337)
    assert(peaks(0).r_time === 1.5)
    assert(peaks(0).charge === "+")
    assert(peaks(0).name === "253.09337 @ 1.5")
    assert(peaks(1).charge === "-")
    // Spark wrapper
    val p = "/tmp/graft_test.mzxml"
    Files.writeString(Paths.get(p), xml)
    val df = SpectraIO.readSpectra(spark, p, "mzxml")
    assert(df.count() === 2)
    assert(df.where(col("mz") > 200).count() === 1)
  }
}
