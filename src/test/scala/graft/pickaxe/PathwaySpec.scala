package graft.pickaxe

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.chem.{Chem, Smiles}

class PathwaySpec extends SparkSuite {
  import spark.implicits._

  private val atp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)OP(=O)(O)O)C(O)C1O"
  private val adp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)O)C(O)C1O"
  private val fadh = "Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC" +
    "(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2"
  private val rule = "[#6;H2D4:8][#8;H0D2:7][#15;H0D4:6][#8;H0D2:5]" +
    "[#15;H0D4:4][#8;H0D2:3][#15;H0D4:2][#8;H1D2R0:1]." +
    "[#1;D1R0:11][#8;H1D2R0:10][#6:9]>>" +
    "[*:1]-[*:2]-[*:10]-[*:9].[*:8]-[*:7]-[*:6]-[*:5]-[*:4]-[*:3]-[*:11]"
  private val target = "Cc1cc2c(cc1C)N(CC(OP(=O)(O)O)C(OP(=O)(O)O)C(O)COP" +
    "(=O)(O)OP(=O)(O)OCC1OC(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2"

  private lazy val st: NetworkState = {
    val core = PickaxeEngine.parseCoreactants(Seq(
      s"ATP\tATP\t$atp", s"ADP\tADP\t$adp"))
    new PickaxeEngine(spark,
      PickaxeEngine.parseRules(Seq(s"2.7.1.a\tATP;Any\t$rule\tAny;ADP\t-"),
        core), core, explicitH = true).run(Seq(fadh), generations = 2)
  }

  private def cid(smiles: String): String =
    Chem.compoundHash(Chem.standardize(smiles).get, 'C')

  test("pathway search: FADH -> double-phospho target in exactly 2 steps") {
    val paths = PathwaySearch.findPaths(st, cid(fadh), cid(target),
      maxLength = 2)
    val collected = paths.select("n_steps").as[Int].collect()
    assert(collected.nonEmpty)
    assert(collected.forall(_ === 2)) // two phosphorylations needed
    // the reference's pruned network has 4 reactions on 2 paths
    assert(paths.count() === 2)
  }

  test("path length cap is respected") {
    assert(PathwaySearch.findPaths(st, cid(fadh), cid(target), 1).isEmpty)
  }

  test("compound gate prunes traversal") {
    // gate that blocks everything -> no paths
    val none = PathwaySearch.findPaths(st, cid(fadh), cid(target), 2,
      compoundGate = Some(lit(false)))
    assert(none.isEmpty)
  }

  test("bfs (discovered-set) returns exactly one shortest path, " +
    "a member of the dfs all-paths set") {
    val all = PathwaySearch.findPaths(st, cid(fadh), cid(target),
      maxLength = 2)
    val allPaths = all.select("path").as[Seq[String]].collect().toSet
    val bfs = PathwaySearch.findPathsBfs(st, cid(fadh), cid(target),
      maxLength = 2)
    val bfsPaths = bfs.select("path").as[Seq[String]].collect()
    assert(bfsPaths.length === 1) // discovered set: one representative
    assert(bfsPaths.head.length === 2) // necessarily a shortest path
    assert(allPaths.contains(bfsPaths.head)) // member of the dfs set
    assert(allPaths.size === 2) // dfs enumerates BOTH phospho orders
  }

  test("bfs respects the depth cap and the compound gate") {
    assert(PathwaySearch.findPathsBfs(st, cid(fadh), cid(target), 1).isEmpty)
    assert(PathwaySearch.findPathsBfs(st, cid(fadh), cid(target), 2,
      compoundGate = Some(lit(false))).isEmpty)
  }

  test("allowRevisits reproduces the reference dfs recursion " +
    "(no cycle check): a superset of the simple-path set") {
    val simple = PathwaySearch.findPaths(st, cid(fadh), cid(target),
      maxLength = 3).count()
    val walks = PathwaySearch.findPaths(st, cid(fadh), cid(target),
      maxLength = 3, allowRevisits = true).count()
    assert(walks >= simple)
  }

  test("enumerate: multi-seed simple-path enumeration with gate and " +
    "cycle-freedom — exact path sets pinned") {
    // C1 -R1-> {C2, C3}; C2 -R2-> C4; C3 -R3-> C4; C4 -R4-> C1 (back
    // edge); C4 -R5-> C5 (gated out: np 5 < 10)
    val compounds = Seq(("C1", 50), ("C2", 50), ("C3", 50), ("C4", 50),
      ("C5", 5)).toDF("_id", "np")
    def m(ids: String*) = ids.map(i => (1, i))
    val reactions = Seq(
      ("R1", m("C1"), m("C2", "C3")),
      ("R2", m("C2"), m("C4")),
      ("R3", m("C3"), m("C4")),
      ("R4", m("C4"), m("C1")),
      ("R5", m("C4"), m("C5")))
      .toDF("_id", "r", "p")
      .select(col("_id"),
        expr("transform(r, x -> struct(x._1 as stoich, x._2 as c_id))")
          .as("Reactants"),
        expr("transform(p, x -> struct(x._1 as stoich, x._2 as c_id))")
          .as("Products"))
    val net = NetworkState(compounds, reactions, 0)
    def run(seedIds: Seq[String], gate: Boolean, depth: Int = 3) =
      PathwaySearch.enumerate(net, seedIds.toDF("_id"), depth,
          if (gate) Some(col("np") >= 10) else None)
        .select(concat_ws(">", col("path")), col("end_id"))
        .as[(String, String)].collect().toSet
    // single seed, gated: the back edge to the seed and the gated C5
    // both prune — exactly 4 paths
    assert(run(Seq("C1"), gate = true) === Set(
      ("R1", "C2"), ("R1", "C3"),
      ("R1>R2", "C4"), ("R1>R3", "C4")))
    // gate off: the two C5 continuations appear, the C1 cycle never
    assert(run(Seq("C1"), gate = false) === Set(
      ("R1", "C2"), ("R1", "C3"), ("R1>R2", "C4"), ("R1>R3", "C4"),
      ("R1>R2>R5", "C5"), ("R1>R3>R5", "C5")))
    // multi-seed: per-walk seen sets are independent — C2's walk may
    // return to C1 (not on ITS path) but never to C2 itself
    assert(run(Seq("C1", "C2"), gate = true) === Set(
      ("R1", "C2"), ("R1", "C3"), ("R1>R2", "C4"), ("R1>R3", "C4"),
      ("R2", "C4"), ("R2>R4", "C1"), ("R2>R4>R1", "C3")))
    // depth cap
    assert(run(Seq("C1"), gate = false, depth = 1) === Set(
      ("R1", "C2"), ("R1", "C3")))
  }

  test("thermo stub: deterministic, additive, reaction deltaG") {
    val w = Smiles.parse("O")
    val e1 = Thermo.bondEnergyEstimate(w)
    assert(e1 === Thermo.bondEnergyEstimate(Smiles.parse("O")))
    assert(e1 === 2 * 459.0) // two O-H bonds
    val dg = Thermo.deltaG(Seq(1 -> w), Seq(1 -> w))
    assert(dg === 0.0)
  }
}
