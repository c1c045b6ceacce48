package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.chem.ReactionRule

/** Full metacyc catalog (the reference's production rule set):
  * the rule-catalog-size oracle is 1216 operators / 45 coreactants
  * (test_rules.py:24-25, BASELINE.md). Also reports how much of the
  * catalog the SMARTS kernel can compile — the compile rate is pinned
  * as a regression floor.
  */
class MetacycCatalogSpec extends AnyFunSuite {

  private val dir = "/root/reference/minedatabase/data/metacyc_rules"
  private def present = Files.exists(Paths.get(dir))

  test("catalog sizes match the reference oracle: 1216 rules, 45 coreactants") {
    assume(present)
    val spark = graft.SparkSuite.session
    val core = PickaxeEngine.parseCoreactants(
      Files.readAllLines(Paths.get(s"$dir/metacyc_coreactants.tsv"))
        .asScala.toSeq)
    assert(core.length === 45) // test_rules.py:25
    val rawRules = PickaxeEngine.parseRules(
      Files.readAllLines(Paths.get(s"$dir/metacyc_generalized_rules.tsv"))
        .asScala.toSeq, core)
    assert(rawRules.length === 1224) // TSV data rows
    // the reference's selection inner-joins the coverage mapping,
    // dropping zero-coverage rules: 1224 -> 1216 (test_rules.py:24)
    import spark.implicits._
    val rulesDf = rawRules.map(r => (r.name, r.smarts))
      .toDF("Name", "SMARTS")
    val coverage = spark.read.option("header", "true").option("sep", "\t")
      .csv(s"$dir/metacyc21_coverage.tsv")
      .select(org.apache.spark.sql.functions.col("Rules").as("Name"))
    val selected = RuleSelection.select(rulesDf, coverage)
    assert(selected.count() === 1216) // test_rules.py:24
    assert(selected.select("Name").distinct().count() === 1216)
  }

  test("SMARTS kernel compiles the overwhelming majority of the catalog") {
    assume(present)
    val core = PickaxeEngine.parseCoreactants(
      Files.readAllLines(Paths.get(s"$dir/metacyc_coreactants.tsv"))
        .asScala.toSeq)
    val rules = PickaxeEngine.parseRules(
      Files.readAllLines(Paths.get(s"$dir/metacyc_generalized_rules.tsv"))
        .asScala.toSeq, core)
    val results = rules.map { r =>
      try { ReactionRule.parse(r.smarts); None }
      catch { case e: Exception => Some(r.name -> e.getMessage) }
    }
    val failures = results.flatten
    val rate = 1.0 - failures.length.toDouble / rules.length
    info(f"compile rate: ${rate * 100}%.1f%% (${failures.length} failures)")
    failures.take(5).foreach { case (n, m) => info(s"  $n: ${m.take(90)}") }
    assert(rate >= 1.0) // the full catalog compiles today; keep it so
  }
}
