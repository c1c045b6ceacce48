package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Where a run's rules and coreactants come from — the template's
  * "Rule specification and generation" block
  * (pickaxe_run_template.py:70-90).
  */
sealed trait RulesSource

/** `metacyc_generalized(...)` (rules.py:164-283): the shipped MetaCyc
  * catalog cut by mapped-reaction coverage. `nRules` / `fractionCoverage`
  * follow RuleSelection.select; `excludeSmarts` / `includeSmarts` are
  * the template's exclude_containing/include_containing regexes over
  * the rule SMARTS.
  */
final case class MetacycGeneralized(
    nRules: Option[Int] = None,
    fractionCoverage: Option[Double] = None,
    excludeSmarts: Option[String] = None,
    includeSmarts: Option[String] = None,
    dataDir: String = "/root/reference/minedatabase/data/metacyc_rules")
  extends RulesSource

/** Explicit TSV paths (the conftest / unit-test shape: a rules TSV and
  * a coreactants TSV in the reference's column layout).
  */
final case class ExplicitTsv(rulesPath: String, coreactantsPath: String)
  extends RulesSource

/** Pre-built rule rows (callers that already ran a selection). */
final case class ExplicitRules(
    rules: Seq[RuleRow], coreactants: Seq[CoreactantRow]) extends RulesSource

/** One end-to-end run configuration — the Spark-native analog of
  * `pickaxe_run_template.py`'s knob block: rules source, compound and
  * target files, expansion depth and flags, the filter chain, and the
  * output sinks. Knobs the Mongo template exposes that have no meaning
  * here (connection URIs, process counts, RDKit log verbosity) are
  * intentionally absent; `processes` is Spark's parallelism.
  */
final case class PickaxeRunConfig(
    rules: RulesSource,
    inputCpds: String, // csv/tsv/json, S1 dispatch (id,smiles / inchi)
    generations: Int = 1,
    explicitH: Boolean = false, // template explicit_h
    targetCpds: Option[String] = None, // template target_cpds
    filters: Seq[NetworkFilter] = Nil, // template filter block, typed
    filterAfterFinalGen: Boolean = true, // template default True
    pruneBetweenGens: Boolean = false, // prune_between_gens
    pruneToTargets: Boolean = false, // prune_to_targets
    writeTsvDir: Option[String] = None, // write_to_csv + output_dir
    mineSink: Option[(String, String)] = None) // (outDir, mineName)

/** Config-driven end-to-end expansion — load rules, load compounds,
  * transform, prune, write — so a reference user's run script ports by
  * transcribing its knob block into one case class.
  */
object PickaxeRun {

  private def lines(p: String): Seq[String] =
    Files.readAllLines(Paths.get(p)).asScala.toSeq

  /** Resolve a RulesSource to engine inputs. */
  def loadRules(
      spark: SparkSession,
      src: RulesSource): (Seq[RuleRow], Seq[CoreactantRow]) = src match {
    case ExplicitRules(r, c) => (r, c)
    case ExplicitTsv(rp, cp) =>
      val core = PickaxeEngine.parseCoreactants(lines(cp))
      (PickaxeEngine.parseRules(lines(rp), core), core)
    case MetacycGeneralized(n, f, ex, in, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val core = PickaxeEngine.parseCoreactants(
        lines(s"$dir/metacyc_coreactants.tsv"))
      val raw = PickaxeEngine.parseRules(
        lines(s"$dir/metacyc_generalized_rules.tsv"), core)
      val rulesDf = raw.map(r => (r.name, r.smarts)).toDF("Name", "SMARTS")
      val coverage = spark.read
        .option("header", "true").option("sep", "\t")
        .csv(s"$dir/metacyc21_coverage.tsv")
        .select(col("Rules").as("Name"))
      val keep = RuleSelection
        .select(rulesDf, coverage, f, n, ex, in)
        .select("Name").as[String].collect().toSet
      (raw.filter(r => keep(r.name)), core)
  }

  /** Standardized target SMILES from a targets csv (load_targets,
    * pickaxe.py:258-306: id,smiles columns, standardize on load).
    * Collects — for template-scale target lists and callers that need
    * the SMILES themselves; `execute` uses [[loadTargetIds]] instead.
    */
  def loadTargetSmiles(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    PickaxeEngine.loadCompoundFile(spark, path)
      .select("SMILES").as[String].collect().toSeq
  }

  /** Distributed target-id load: standardize + hash the targets file
    * and keep only the `_id` column (the content hash pruneToTargets
    * matches on). Nothing crosses the driver.
    */
  def loadTargetIds(spark: SparkSession, path: String): DataFrame =
    PickaxeEngine.loadCompoundFile(spark, path).select("_id")

  /** Execute the configured run and return the final network state
    * (also written to the configured sinks). Mirrors the template's
    * sequence: load rules -> load compounds -> transform_all with the
    * filter chain -> prune to targets -> write.
    */
  def execute(spark: SparkSession, cfg: PickaxeRunConfig): NetworkState = {
    val (rules, core) = loadRules(spark, cfg.rules)
    val engine = new PickaxeEngine(spark, rules, core,
      explicitH = cfg.explicitH)
    // the seed stays a DataFrame end to end: loadCompoundFile already
    // standardized + hashed it distributed, and runFrom consumes it as
    // gen 0 — no driver collect, no second standardization pass
    val starting = PickaxeEngine.loadCompoundFile(spark, cfg.inputCpds)
    val expanded = engine.runFrom(engine.initialState(starting),
      cfg.generations, cfg.filters,
      filterAfterFinalGen = cfg.filterAfterFinalGen,
      pruneBetweenGens = cfg.pruneBetweenGens)
    val state =
      if (cfg.pruneToTargets) {
        val targetsPath = cfg.targetCpds.getOrElse(sys.error(
          "pruneToTargets set but no targetCpds configured"))
        val targetIds = loadTargetIds(spark, targetsPath)
        require(!targetIds.isEmpty,
          "pruneToTargets set but no targetCpds configured")
        engine.pruneToTargetsDf(expanded, targetIds)
      } else expanded
    cfg.writeTsvDir.foreach(dir => engine.writeTsv(state, dir))
    cfg.mineSink.foreach { case (outDir, name) =>
      MineSink.save(spark, state, outDir, name)
    }
    state
  }
}
