package graft.pickaxe

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the curated-sheet ingest, rule rotation, and top-reactions
  * export against hand-computed fixtures (the last three Scripts
  * one-offs: add_rxns_from_excel.py, RxnRuleProcessing.py,
  * print_top_30_rxns.py).
  */
class CuratedRxnsSpec extends SparkSuite {

  private val compoundsSheet = Seq(
    ("glc", "OCC1OC(O)C(O)C(O)C1O"), // glucose
    ("etoh", "CCO"),
    ("acald", "CC=O"),
    ("h2o", "O"),
    ("bad", "not-a-smiles"),
    ("empty", ""))

  test("compound sheet: resolution, hn wildcard, failure reporting") {
    val (abrv, cs, failed) = CuratedRxns.compoundSheet(compoundsSheet)
    assert(cs.length === 4)
    assert(abrv("hn") === "[*]")
    assert(abrv.keySet === Set("hn", "glc", "etoh", "acald", "h2o"))
    // ids are the engine's compound hashes of the standardized SMILES
    val etohId = graft.chem.Chem.compoundHash(
      graft.chem.Chem.standardize("CCO").get, 'C')
    assert(abrv("etoh") === etohId)
    assert(failed === Seq("Failed to parse not-a-smiles",
      "SMILES missing: empty"))
  }

  test("parseTextRxn: coefficients, merging, unknown abbreviations") {
    val (abrv, _, _) = CuratedRxns.compoundSheet(compoundsSheet)
    val Right((re, pr)) =
      CuratedRxns.parseTextRxn("2 etoh + glc = acald + h2o", abrv)
    assert(re.map(_.stoich) === re.sortBy(_.c_id).map(_.stoich))
    assert(re.find(_.c_id == abrv("etoh")).get.stoich === 2)
    assert(re.find(_.c_id == abrv("glc")).get.stoich === 1)
    assert(pr.length === 2 && pr.forall(_.stoich == 1))
    // repeated terms merge (E5 normal form)
    val Right((re2, _)) =
      CuratedRxns.parseTextRxn("etoh + etoh = acald", abrv)
    assert(re2 === Seq(Stoich(2, abrv("etoh"))))
    // the hn wildcard resolves
    val Right((re3, _)) = CuratedRxns.parseTextRxn("hn = etoh", abrv)
    assert(re3 === Seq(Stoich(1, "[*]")))
    assert(CuratedRxns.parseTextRxn("nope = etoh", abrv)
      === Left("Could not parse nope"))
    assert(CuratedRxns.parseTextRxn("etoh -> acald", abrv).isLeft)
  }

  test("ingest: hashes, references, rejects — counts pinned") {
    val (abrv, _, _) = CuratedRxns.compoundSheet(compoundsSheet)
    val rows = Seq(
      CuratedRxns.RxnSheetRow("ethanol oxidation",
        "etoh = acald", "ethanol = acetaldehyde",
        "12345678; doi:10.1/x", "oxidation ", " spontaneous"),
      CuratedRxns.RxnSheetRow("glucose thing",
        "glc + unknownX = etoh", "glucose + ? = ethanol",
        "", "", ""),
      CuratedRxns.RxnSheetRow("unreferenced",
        "acald = etoh", "acetaldehyde = ethanol",
        "   ", "", ""),
      CuratedRxns.RxnSheetRow("skipped", "", "", "", "", ""))
    val (rxns, rejected) = CuratedRxns.ingest(spark, rows, abrv)
    assert(rxns.count() === 2)
    assert(rejected.count() === 1)
    // a blank/whitespace PMID cell yields an EMPTY reference list, not
    // a single-element list holding the raw blank string
    val unref = rxns.collect()
      .find(_.getAs[String]("Metabolite") == "unreferenced").get
    assert(unref.getAs[Seq[String]]("References") === Seq.empty[String])
    val r = rxns.collect()
      .find(_.getAs[String]("Metabolite") == "ethanol oxidation").get
    assert(r.getAs[String]("Type") === "oxidation")
    assert(r.getAs[String]("Notes") === "spontaneous")
    assert(r.getAs[Seq[String]]("References")
      === Seq("12345678", "doi:10.1/x"))
    // the hash is the engine's P11 content hash over resolved tuples
    val expected = RuleKernel.reactionHash(
      Seq(Stoich(1, abrv("etoh"))), Seq(Stoich(1, abrv("acald"))))
    assert(r.getAs[String]("InChI_hash") === expected)
    assert(rejected.collect().head.getAs[String]("reason")
      === "Could not parse unknownX")
  }

  test("unbalancedOps + rotateProducts: the RxnRuleProcessing pass") {
    val log =
      """INFO: something
        |Warning: Unbalanced Reaction produced by 2.7.1.a
        |Warning: Unbalanced Reaction produced by 3.5.-1.b
        |Warning: Unbalanced Reaction produced by 2.7.1.a
        |other noise""".stripMargin
    assert(CuratedRxns.unbalancedOps(log) === Set("2.7.1.a", "3.5.-1.b"))

    import spark.implicits._
    val rules = Seq(
      ("2.7.1.a", "Any;ADP;Pi"),
      ("3.5.-1.b", "X"),
      ("1.1.1.c", "A;B")).toDF("Name", "Products")
    val out = CuratedRxns.rotateProducts(rules,
      Set("2.7.1.a", "3.5.-1.b"))
      .orderBy("Name").collect().map(_.getString(1))
    // flagged multi-product rule rotates right (last -> first);
    // single-product flagged rule and unflagged rules are untouched
    assert(out === Array("A;B", "Pi;Any;ADP", "X"))
  }

  test("nameToCid translates against the coreactant table") {
    val core = Map("ATP" -> "Xabc", "ADP" -> "Xdef")
    assert(CuratedRxns.nameToCid("ATP;Any", core) === Some("Xabc;Any"))
    assert(CuratedRxns.nameToCid("ATP;ADP", core) === Some("Xabc;Xdef"))
    assert(CuratedRxns.nameToCid("ATP;GTP", core) === None)
  }

  test("reactionsForLinkedCompounds + exportInchiRxns equation render") {
    import spark.implicits._
    val compounds = Seq(
      ("C1", Seq("seed:A"), "alpha", "InChI=1S/a"),
      ("C2", Seq.empty[String], "beta", "InChI=1S/b"),
      ("C3", Seq("seed:Z"), "gamma", "InChI=1S/c"))
      .toDF("_id", "db_links", "name", "inchi")
    val reactions = Seq(
      ("R1", Seq(Stoich(1, "C1"), Stoich(2, "C2")), Seq(Stoich(1, "C3")),
        Seq("2.7.1.a", "3.5.1.b")),
      ("R2", Seq(Stoich(1, "C2")), Seq(Stoich(1, "C1")), Seq("1.1.1.c")))
      .toDF("_id", "Reactants", "Products", "Operators")
    // only R1 consumes a seed-linked compound (C1; R2 only produces it)
    val hit = CuratedRxns.reactionsForLinkedCompounds(
      compounds, reactions, Seq("seed:A"))
    assert(hit.select("_id").as[String].collect().toSeq === Seq("R1"))
    val tsv = CuratedRxns.exportInchiRxns(
      compounds.select("_id", "name", "inchi"), hit).collect().head
    assert(tsv.getAs[String]("Reaction Rule") === "2.7.1.a, 3.5.1.b")
    assert(tsv.getAs[String]("ID") === "R1")
    assert(tsv.getAs[String]("Equation") ===
      "(1) alpha[InChI=1S/a] + (2) beta[InChI=1S/b] => (1) gamma[InChI=1S/c]")
  }
}
