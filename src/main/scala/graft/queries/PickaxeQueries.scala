package graft.queries

import org.apache.spark.sql.functions._

import graft.pickaxe._

/** Pickaxe-engine pack: the reference's own surface driven end to end —
  * rule-driven expansion, target pruning, mass/adduct search — on the
  * public fixture chemistry (SMILES/SMARTS from the reference's test
  * data files). Results are deterministic; they are not SQL-expressible
  * over the synthetic tables, so the driver records rows-only checks.
  */
object PickaxeQueries extends QueryPack {

  // Public fixture data (reference tests/data, pure data not code)
  private val atp = "Nc1ncnc2c1ncn2[C@@H]1O[C@H](COP(=O)(O)OP(=O)(O)OP(=O)" +
    "(O)O)[C@@H](O)[C@H]1O"
  private val adp = "Nc1ncnc2c1ncn2[C@@H]1O[C@H](COP(=O)(O)OP(=O)(O)O)" +
    "[C@@H](O)[C@H]1O"
  private val fadh = "Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC" +
    "(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2"
  private val phosphorylation = "[#6;H2D4:8][#8;H0D2:7][#15;H0D4:6]" +
    "[#8;H0D2:5][#15;H0D4:4][#8;H0D2:3][#15;H0D4:2][#8;H1D2R0:1]." +
    "[#1;D1R0:11][#8;H1D2R0:10][#6:9]>>" +
    "[*:1]-[*:2]-[*:10]-[*:9].[*:8]-[*:7]-[*:6]-[*:5]-[*:4]-[*:3]-[*:11]"

  private def engine(s: org.apache.spark.sql.SparkSession): PickaxeEngine = {
    val core = PickaxeEngine.parseCoreactants(Seq(
      s"ATP\tATP\t$atp", s"ADP\tADP\t$adp"))
    val rules = PickaxeEngine.parseRules(
      Seq(s"2.7.1.a\tATP;Any\t$phosphorylation\tAny;ADP\t-"), core)
    new PickaxeEngine(s, rules, core)
  }

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_pickaxe_expand", Seq("E1", "E2", "E3", "E4", "E5", "E6", "E7",
        "D1", "D2", "A1", "J1", "J2", "S2", "S4", "S5"),
      (s, _) => {
        val st = engine(s).run(Seq(fadh), generations = 2)
        st.compounds.groupBy("Generation", "Type")
          .agg(count(lit(1)).as("n_compounds"))
          .crossJoin(st.reactions.agg(count(lit(1)).as("n_reactions_total")))
          .orderBy("Generation", "Type")
      },
      None,
      "Full 2-generation FADH x 2.7.1.a expansion (the reference's 31/49 " +
        "oracle network) through the Spark engine; per-gen/type counts."),

    GraftQuery(
      "q_pickaxe_prune", Seq("D4", "D5", "J5", "W1"),
      (s, _) => {
        val e = engine(s)
        val st = e.run(Seq(fadh), generations = 2)
        // prune to the double-phosphorylated target (test_targets.csv)
        val target = "Cc1cc2c(cc1C)N(CC(OP(=O)(O)O)C(OP(=O)(O)O)C(O)COP" +
          "(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2"
        val pruned = e.assignIds(e.pruneToTargets(st, Seq(target)))
        pruned.compounds.select("ID", "Type", "Generation", "Formula")
          .orderBy("ID")
      },
      None,
      "Reverse-BFS prune to a target (6-compound / 4-reaction minimal " +
        "network, matching test_pickaxe.py:218-220) + dense id assignment."),

    GraftQuery(
      "q_pickaxe_mass_search", Seq("J6", "S9", "A6", "P4", "P13"),
      (s, _) => {
        import s.implicits._
        val st = engine(s).run(Seq(fadh), generations = 1)
        val peaks = Seq(
          // FADH+80 (phosphorylated, [M+H]+) and two decoys
          ("pk1", 867.1633 + 1.007276, "+"),
          ("pk2", 200.05, "+"),
          ("pk3", 785.15, "-"))
          .toDF("name", "mz", "charge")
        val hits = MassSearch.adductSearch(s, st.compounds, peaks,
          tol = 0.01)
        MassSearch.peakStats(hits).orderBy("peak")
      },
      None,
      "Mass/adduct window search over the expanded network: peaks x " +
        "adducts broadcast -> bucketed interval join -> per-peak stats."),
  )
}
