package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.chem.ReactionRule

/** The ORIGINAL BNICE rule catalogs the reference ships alongside the
  * MetaCyc set (rules.py:442-457 returns the enzymatic pair; the
  * chemical-damage pair sits in the same data directory): these are
  * the legacy operators every pre-MetaCyc MINE database was built
  * with, so a user switching engines can point `rule_list` at them.
  * Catalog sizes and the SMARTS compile rate are pinned the same way
  * MetacycCatalogSpec pins the 1216/45 production set.
  */
class BniceCatalogSpec extends AnyFunSuite {

  private val dir = "/root/reference/minedatabase/data/original_rules"
  private def present = Files.exists(Paths.get(dir))

  private def lines(p: String): Seq[String] =
    Files.readAllLines(Paths.get(s"$dir/$p")).asScala.toSeq

  test("BNICE enzymatic catalog: 250 rules / 33 coreactants, all " +
    "SMARTS compile") {
    assume(present)
    val core = PickaxeEngine.parseCoreactants(
      lines("EnzymaticCoreactants.tsv"))
    assert(core.length === 33)
    val rules = PickaxeEngine.parseRules(
      lines("EnzymaticReactionRules.tsv"), core)
    assert(rules.length === 250)
    val failures = rules.flatMap { r =>
      try { ReactionRule.parse(r.smarts); None }
      catch { case e: Exception => Some(r.name -> e.getMessage) }
    }
    failures.take(5).foreach { case (n, m) => info(s"  $n: ${m.take(90)}") }
    assert(failures.isEmpty,
      s"${failures.length} BNICE enzymatic rules failed to compile")
  }

  test("BNICE chemical-damage catalog: 148 rules / 44 coreactants, " +
    "all SMARTS compile") {
    assume(present)
    val core = PickaxeEngine.parseCoreactants(
      lines("ChemicalDamageCoreactants.tsv"))
    assert(core.length === 44)
    val rules = PickaxeEngine.parseRules(
      lines("ChemicalDamageReactionRules.tsv"), core)
    assert(rules.length === 148)
    val failures = rules.flatMap { r =>
      try { ReactionRule.parse(r.smarts); None }
      catch { case e: Exception => Some(r.name -> e.getMessage) }
    }
    failures.take(5).foreach { case (n, m) => info(s"  $n: ${m.take(90)}") }
    assert(failures.isEmpty,
      s"${failures.length} chemical-damage rules failed to compile")
  }

  test("full BNICE enzymatic catalog expands glucose one generation") {
    assume(present)
    val spark = graft.SparkSuite.session
    val core = PickaxeEngine.parseCoreactants(
      lines("EnzymaticCoreactants.tsv"))
    val rules = PickaxeEngine.parseRules(
      lines("EnzymaticReactionRules.tsv"), core)
    val engine = new PickaxeEngine(spark, rules, core, explicitH = true)
    val st = engine.run(Seq("OCC1OC(O)C(O)C(O)C1O"), generations = 1)
    val nPred = st.compounds
      .where(org.apache.spark.sql.functions.col("Type") === "Predicted")
      .count()
    val nRxn = st.reactions.count()
    info(s"glucose x 250 BNICE rules: $nPred products, $nRxn reactions")
    // kernel-derived regression pins (no reference oracle publishes
    // BNICE expansion counts): 17 products / 18 reactions as of the
    // round-12 SMARTS extension
    assert(nPred === 17L, s"full-catalog product count drifted: $nPred")
    assert(nRxn === 18L, s"full-catalog reaction count drifted: $nRxn")
  }

  test("a BNICE hydrolysis expansion runs end to end") {
    assume(present)
    val spark = graft.SparkSuite.session
    val core = PickaxeEngine.parseCoreactants(
      lines("EnzymaticCoreactants.tsv"))
    // 3.* hydrolysis family only: a bounded end-to-end slice (the
    // full 250-rule frontier is catalog-scale work, exercised at
    // MetaCyc size elsewhere)
    val rules = PickaxeEngine.parseRules(
      lines("EnzymaticReactionRules.tsv"), core)
      .filter(_.name.startsWith("3."))
    assert(rules.nonEmpty)
    val engine = new PickaxeEngine(spark, rules, core, explicitH = true)
    // ethyl acetate: the canonical ester-hydrolysis substrate
    val st = engine.run(Seq("CCOC(C)=O"), generations = 1)
    val products = st.compounds
      .where(org.apache.spark.sql.functions.col("Type") === "Predicted")
      .select("SMILES").collect().map(_.getString(0)).toSet
    info(s"gen-1 products: $products")
    // hydrolysis must split the ester into ethanol + acetic acid;
    // acetate is cpd00029 in the BNICE coreactant table, so the acid
    // side lands as a Coreactant (E7 rewrite-at-birth), not Predicted
    // — it must still appear in the reaction equation
    assert(products.contains("CCO"),
      s"ester hydrolysis missing ethanol: $products")
    val rxns = st.reactions.select("SMILES_rxn")
      .collect().map(_.getString(0))
    assert(rxns.exists(r => r.contains("CCO") && r.contains("CC(=O)O")),
      s"no hydrolysis equation with both products: ${rxns.toSeq}")
  }
}
