package graft.pickaxe

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins for the db_plots.py data-prep analog: per-Type property
  * quartiles (make_box_plots) and normalized fingerprint-bit
  * prevalence (make_fp_heatmap).
  */
class DbStatsSpec extends SparkSuite {

  private def compounds = {
    import spark.implicits._
    Seq(
      PickaxeEngine.mkCompound("C1", "CCO", "Starting Compound", 0, true),
      PickaxeEngine.mkCompound("C2", "CCCO", "Predicted", 1, true),
      PickaxeEngine.mkCompound("C3", "CCCCO", "Predicted", 1, true),
      PickaxeEngine.mkCompound("C4", "CCCCCO", "Predicted", 2, true),
      PickaxeEngine.mkCompound("X1", "O", "Coreactant", 0, false))
      .toDF()
  }

  test("propertyBox: coreactants excluded, exact quartiles per Type") {
    val box = DbStats.propertyBox(compounds).collect()
      .map(r => (r.getAs[String]("Type"), r.getAs[String]("prop")) -> r)
      .toMap
    // no coreactant group at all (db_plots.py:16 $ne filter)
    assert(!box.keySet.exists(_._1 == "Coreactant"))
    assert(box.keySet.map(_._2) === Set("Mass", "logP", "NP_likeness"))
    val m = box(("Predicted", "Mass"))
    assert(m.getAs[Long]("n") === 3L)
    // exact percentile with linear interpolation over the 3 masses
    val masses = Seq("CCCO", "CCCCO", "CCCCCO")
      .map(s => graft.chem.Formula.exactMass(graft.chem.Smiles.parse(s)))
      .sorted
    assert(math.abs(m.getAs[Double]("min") - masses.head) < 1e-3)
    assert(math.abs(m.getAs[Double]("median") - masses(1)) < 1e-3)
    assert(math.abs(m.getAs[Double]("max") - masses(2)) < 1e-3)
    // the lone starting compound collapses to a single point
    val s0 = box(("Starting Compound", "Mass"))
    assert(s0.getAs[Double]("min") === s0.getAs[Double]("max"))
  }

  test("fpPrevalence: per-generation max normalizes to 1, top-N bounds " +
    "the bit set, range ties break deterministically") {
    val prev = DbStats.fpPrevalence(compounds, nRows = 5)
    val rows = prev.collect().map(r => (r.getAs[Int]("bit"),
      r.getAs[Int]("Generation"), r.getAs[Double]("prevalence")))
    assert(rows.nonEmpty)
    // every generation present has a bit at prevalence exactly 1.0
    val byGen = rows.groupBy(_._2)
    byGen.foreach { case (g, rs) =>
      assert(math.abs(rs.map(_._3).max - 1.0) < 1e-9,
        s"generation $g max prevalence != 1")
      assert(rs.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    }
    // top-N keeps at most nRows distinct bits
    assert(rows.map(_._1).distinct.length <= 5)
    // deterministic under repetition (groupBy+limit has a fixed
    // orderBy tie-break)
    val again = DbStats.fpPrevalence(compounds, nRows = 5).collect()
      .map(r => (r.getAs[Int]("bit"), r.getAs[Int]("Generation"),
        r.getAs[Double]("prevalence"))).toSet
    assert(again === rows.toSet)
  }
}
