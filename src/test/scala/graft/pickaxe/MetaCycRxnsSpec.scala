package graft.pickaxe

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.chem.{Chem, Smiles}

/** MetaCyc curated-reaction ingest parity with
  * Scripts/add_metacyc_rxns.py: SDF FRAME-ID dictionary, stoichiometric
  * Counter semantics, the three ValueError rejections (Undefined
  * Compound / Unbalanced Reaction / No Change), citation stripping, and
  * the gen-0 compound insert set.
  */
class MetaCycRxnsSpec extends SparkSuite {

  // ethanol and dimethyl ether are C2H6O isomers (balanced pair);
  // acetaldehyde is C2H4O (unbalanced vs either)
  private val mols = Seq(
    "ETOH" -> "CCO", "DME" -> "COC", "ACET" -> "CC=O")

  private lazy val sdfContent = mols.map { case (fid, smi) =>
    Exports.molBlock(Smiles.parse(smi), fid) +
      s"> <FRAME-ID>\n$fid\n\n" + "$$$$\n"
  }.mkString

  private lazy val tsvPath = {
    val d = Files.createTempDirectory("metacyc").toFile
    d.deleteOnExit()
    val tsv = Seq(
      "MetaCyc ID\tCitations\tReactants of reaction\tProducts of reaction",
      "RXN-OK\t[12345] // [67890]\tETOH\tDME",
      "RXN-STOICH\t99\tETOH // ETOH\tDME // DME",
      "RXN-UNDEF\t1\tMISSING\tDME",
      "RXN-UNBAL\t2\tETOH\tACET",
      "RXN-SAME\t3\tETOH\tETOH").mkString("\n") + "\n"
    val f = d.toPath.resolve("reactions.tsv")
    Files.write(f, tsv.getBytes)
    f.toString
  }

  private lazy val dict = MetaCycRxns.compoundDict(sdfContent)

  test("compoundDict keys by FRAME-ID with engine-parity hashes") {
    assert(dict.keySet === Set("ETOH", "DME", "ACET"))
    val etoh = dict("ETOH")
    assert(etoh.cId ===
      Chem.compoundHash(Chem.standardize("CCO").get, 'C'))
    assert(etoh.atoms === Map("C" -> 2, "H" -> 6, "O" -> 1))
    assert(dict("ACET").atoms === Map("C" -> 2, "H" -> 4, "O" -> 1))
  }

  test("ingest keeps balanced changed reactions and rejects the rest") {
    val raw = MetaCycRxns.readReactionsTsv(spark, tsvPath)
    val (reactions, rejected) = MetaCycRxns.ingest(raw, dict)

    val rej = rejected.collect().map(r =>
      r.getAs[String]("metacyc_id") -> r.getAs[String]("reason")).toMap
    assert(rej === Map(
      "RXN-UNDEF" -> "Undefined Compound",
      "RXN-UNBAL" -> "Unbalanced Reaction",
      "RXN-SAME" -> "No Change"))

    val kept = reactions.collect().map(r =>
      r.getAs[String]("metacyc_id") -> r).toMap
    assert(kept.keySet === Set("RXN-OK", "RXN-STOICH"))

    // citation quoting stripped, MetaCyc trailer appended (script :53-57)
    assert(kept("RXN-OK").getSeq[String](1) ===
      Seq("12345", "67890", "MetaCyc: RXN-OK"))

    // Counter stoichiometry: 'ETOH // ETOH' -> one (2, hash) tuple
    val stoich = kept("RXN-STOICH")
      .getSeq[org.apache.spark.sql.Row](2)
      .map(t => (t.getInt(0), t.getString(1)))
    assert(stoich === Seq((2, dict("ETOH").cId)))
  }

  test("compoundsToInsert lands each referenced compound once at gen 0") {
    val raw = MetaCycRxns.readReactionsTsv(spark, tsvPath)
    val (reactions, _) = MetaCycRxns.ingest(raw, dict)
    val comps = MetaCycRxns.compoundsToInsert(reactions, dict)
    val rows = comps.collect().map(r =>
      (r.getAs[String]("c_id"), r.getAs[String]("smiles"),
        r.getAs[Int]("Generation"))).toSet
    // only ETOH and DME appear in kept reactions; ACET does not
    assert(rows === Set(
      (dict("ETOH").cId, dict("ETOH").smiles, 0),
      (dict("DME").cId, dict("DME").smiles, 0)))
  }

  test("unbalance detection is symmetric (missing element either side)") {
    import spark.implicits._
    // H2O2 -> H2O loses an O entirely; O2 -> H2O gains H from nothing
    val d2 = MetaCycRxns.compoundDict(Seq(
      "H2O2" -> "OO", "H2O" -> "O").map { case (fid, smi) =>
      Exports.molBlock(Smiles.parse(smi), fid) +
        s"> <FRAME-ID>\n$fid\n\n" + "$$$$\n"
    }.mkString)
    val raw = Seq(
      ("R1", "7", "H2O2", "H2O"),
      ("R2", "8", "H2O", "H2O2"))
      .toDF("metacyc_id", "citations", "reactants_raw", "products_raw")
    val (_, rejected) = MetaCycRxns.ingest(raw, d2)
    assert(rejected.where(col("reason") === "Unbalanced Reaction")
      .count() === 2)
  }
}
