package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Mirrors the reference's metabolomics-filter oracle
  * (test_filters.py:232-252, test_met_filter_mass): expanding the
  * 4-compound / 10-rule fixture for 2 generations under the
  * MetabolomicsFilter at 0.001 Da with [M+H]+ / [M-H]- leaves EXACTLY
  * one generation-1 compound, and it matches peak Test3.
  */
class MetabolomicsFilterSpec extends SparkSuite {
  import spark.implicits._

  private val dataDir = "/root/reference/tests/data/test_filters"
  private val metCsv =
    "/root/reference/tests/data/test_metabolomics/test_metabolomics_data.csv"
  private def present =
    Files.exists(Paths.get(dataDir)) && Files.exists(Paths.get(metCsv))

  private def lines(p: String): Seq[String] =
    Files.readAllLines(Paths.get(p)).asScala.toSeq

  test("peak CSV loader: structure-annotated peaks are known, rest unknown") {
    assume(present)
    val (unknown, known) = MetabolomicsFilter.parsePeaksCsv(lines(metCsv))
    assert(unknown.map(_.name) === Seq("Test1", "Test3"))
    assert(known.map(_._1.name) === Seq("Test2"))
    assert(unknown.find(_.name == "Test3").get.mz === 253.09337)
  }

  test("window enumeration: polarity-matched adducts, strict +/- tol") {
    val f = MetabolomicsFilter(
      Seq(PeakRow("p+", 0.0, 100.0, "+", Nil),
        PeakRow("p-", 0.0, 100.0, "-", Nil)),
      tol = 0.001)
    assert(f.ranges.map(r => (r._3, r._4)) ===
      Seq(("p+", "[M+H]+"), ("p-", "[M-H]-")))
    val (lo, hi, _, _) = f.ranges.head
    assert(math.abs(lo - (100.0 - 1.007276 - 0.001)) < 1e-9)
    assert(math.abs(hi - (100.0 - 1.007276 + 0.001)) < 1e-9)
  }

  test("scale path: >64 peak windows switch to the interval join and " +
    "block the identical set") {
    assume(present)
    import spark.implicits._
    val cpds = (1 to 200).map { i =>
      CompoundRow(s"C$i", "", "C", "Predicted", 1, "CH4", 0,
        100.0 + i * 0.5, true)
    } :+ CompoundRow("CS", "", "C", "Starting Compound", 0, "CH4", 0,
      16.0, false)
    val st = NetworkState(cpds.toDF(), spark.emptyDataset[ReactionRow].toDF(), 1)
    // every 3rd compound's [M+H]+ is a peak -> should survive
    val manyPeaks = (1 to 200 by 3).map { i =>
      PeakRow(s"p$i", 0.0, 100.0 + i * 0.5 + 1.007276, "+", Nil)
    }
    val few = MetabolomicsFilter(manyPeaks.take(20), tol = 0.001)
    val many = MetabolomicsFilter(manyPeaks, tol = 0.001)
    assert(manyPeaks.size > 64 && few.peaks.size <= 64)
    // join path (many) agrees with OR path (few) on the shared prefix
    val blockedMany = many.blocked(st).as[String].collect().toSet
    val expectedSurvivors = (1 to 200 by 3).map(i => s"C$i").toSet
    assert(blockedMany === (1 to 200).map(i => s"C$i").toSet -- expectedSurvivors)
    val blockedFew = few.blocked(st).as[String].collect().toSet
    // compounds covered by the first 20 peaks are unblocked in both
    val first20 = manyPeaks.take(20).map(_.name.stripPrefix("p").toInt)
      .map(i => s"C$i").toSet
    assert(first20.forall(c => !blockedFew(c) && !blockedMany(c)))
  }

  test("met filter mass: exactly 1 gen-1 survivor, matched to Test3 " +
    "(test_filters.py:232-252)") {
    assume(present)
    val core = PickaxeEngine.parseCoreactants(
      lines(s"$dataDir/metacyc_coreactants.tsv"))
    val rules = PickaxeEngine.parseRules(
      lines(s"$dataDir/test_filter_rules.tsv"), core)
    val starts = lines(s"$dataDir/test_filter_compounds.csv")
      .tail.filter(_.trim.nonEmpty).map(_.split(",")(1).trim)
    val (unknown, _) = MetabolomicsFilter.parsePeaksCsv(lines(metCsv))
    val f = MetabolomicsFilter(unknown, tol = 0.001)
    val e = new PickaxeEngine(spark, rules, core)
    val st = e.run(starts, generations = 2, filters = Seq(f))
    val gen1 = f.annotate(st.compounds.where(col("Generation") === 1))
      .select("SMILES", "Mass", "Matched_Peak_IDs", "Matched_Adducts")
      .collect()
    assert(gen1.length === 1) // test_filters.py:250
    assert(gen1.head.getSeq[String](2) === Seq("Test3")) // test_filters.py:252
    assert(gen1.head.getSeq[String](3) === Seq("[M+H]+"))
  }
}
