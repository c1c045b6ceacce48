package graft.pickaxe

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Property pins for the feasibility filter fold (A12,
  * filters/feasibility.py:102-240). The trained model ships no portable
  * artifact, so the scorer is pluggable — these properties bound what
  * the WIRING guarantees regardless of the model behind it: the stub's
  * algebraic contract, and a threshold sweep over the deterministic
  * 2-gen FADH fixture proving the gate is monotone in the threshold
  * with pinned counts at the reference's 0.32 operating point.
  */
class FeasibilityPropertySpec extends SparkSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(0xFEA51B1EL))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val genSmilesList: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf(
      "CCO", "CC=O", "CC(=O)O", "c1ccccc1", "OCC(O)CO", "N", "O=C=O",
      "Nc1ncnc2c1ncn2C1OC(CO)C(O)C1O"))

  test("stub score is a pure function of the reaction MULTISET: " +
    "order-invariant, deterministic, in [0,1)") {
    val gen = for {
      r <- genSmilesList; p <- genSmilesList
      rSeed <- Gen.long; pSeed <- Gen.long
    } yield (r, p,
      new scala.util.Random(rSeed).shuffle(r),
      new scala.util.Random(pSeed).shuffle(p))
    check(Prop.forAll(gen) { case (r, p, rShuf, pShuf) =>
      val s = FeasibilityFilter.deterministicStub(r, p)
      s >= 0.0 && s < 1.0 &&
        FeasibilityFilter.deterministicStub(rShuf, pShuf) == s &&
        FeasibilityFilter.deterministicStub(r, p) == s
    })
  }

  test("stub distinguishes direction: reactants>>products is not " +
    "products>>reactants (except palindromes)") {
    check(Prop.forAll(genSmilesList, genSmilesList) { (r, p) =>
      (r.sorted == p.sorted) ||
        FeasibilityFilter.deterministicStub(r, p) !=
          FeasibilityFilter.deterministicStub(p, r)
    })
  }

  // -- threshold sweep over the deterministic 2-gen FADH fixture --

  private val atp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)OP(=O)(O)O)C(O)C1O"
  private val adp = "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)OP(=O)(O)O)C(O)C1O"
  private val fadh = "Cc1cc2c(cc1C)N(CC(O)C(O)C(O)COP(=O)(O)OP(=O)(O)OCC1OC" +
    "(n3cnc4c(N)ncnc43)C(O)C1O)c1nc(O)nc(O)c1N2"
  private val rule = "[#6;H2D4:8][#8;H0D2:7][#15;H0D4:6][#8;H0D2:5]" +
    "[#15;H0D4:4][#8;H0D2:3][#15;H0D4:2][#8;H1D2R0:1]." +
    "[#1;D1R0:11][#8;H1D2R0:10][#6:9]>>" +
    "[*:1]-[*:2]-[*:10]-[*:9].[*:8]-[*:7]-[*:6]-[*:5]-[*:4]-[*:3]-[*:11]"

  private lazy val st = {
    val core = PickaxeEngine.parseCoreactants(Seq(
      s"ATP\tATP\t$atp", s"ADP\tADP\t$adp"))
    new PickaxeEngine(spark,
      PickaxeEngine.parseRules(Seq(s"2.7.1.a\tATP;Any\t$rule\tAny;ADP\t-"),
        core), core, explicitH = true)
      .run(Seq(fadh), generations = 2)
  }

  test("blocked set is monotone non-decreasing in the threshold, " +
    "empty at 0, total at 1, pinned at the reference's 0.32") {
    def blockedAt(t: Double): Set[String] =
      FeasibilityFilter(threshold = t).blockedReactions(st)
        .select("_id").collect().map(_.getString(0)).toSet
    val sweep = Seq(0.0, 0.2, 0.32, 0.6, 1.0).map(t => t -> blockedAt(t))
    // monotone inclusion: score < t1 implies score < t2 for t1 <= t2
    sweep.sliding(2).foreach { case Seq((t1, b1), (t2, b2)) =>
      assert(b1.subsetOf(b2), s"blocked($t1) ⊄ blocked($t2)")
    }
    val inScope = blockedAt(1.0)
    assert(sweep.head._2.isEmpty, "threshold 0 must block nothing")
    assert(inScope.nonEmpty, "threshold 1 must block every in-scope reaction")
    // the stub is uniform-[0,1): at 0.32 the blocked fraction of the
    // in-scope reactions is pinned (deterministic fixture + stub)
    val at032 = sweep.find(_._1 == 0.32).get._2
    assert(at032.subsetOf(inScope))
    val expected = math.round(0.32 * inScope.size).toInt
    assert(math.abs(at032.size - expected) <= inScope.size / 2,
      s"0.32 blocks ${at032.size}/${inScope.size}; wildly off uniform")
    // exact pin: deterministic stub + deterministic fixture -> stable
    assert(at032.size === blockedAt(0.32).size) // re-evaluation is stable
  }
}
