package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Drift kernel: identical slices report zero everywhere, a disjoint
  * shift reproduces hand-computed PSI/KL/KS exactly, and out-of-grid
  * values clamp into the edge bins.
  */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("identical slices report zero drift on every measure") {
    val d = Seq(1L, 3L, 5L, 7L, 9L).toDF("v")
    val r = Drift.binnedDrift(d, d, "v", 0L, 9L, bins = 5).head()
    assert(r.getAs[Double]("psi") === 0.0)
    assert(r.getAs[Double]("kl") === 0.0)
    assert(r.getAs[Double]("ks") === 0.0)
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("disjoint shift matches the hand-computed report") {
    // grid 0..9, 2 bins. ref = {1,1} → bin0×2; cur = {9,9,9} → bin1×3
    // p = (3/4, 1/4), q = (1/5, 4/5) after add-1 smoothing:
    // psi = (0.2−0.75)ln(0.2/0.75) + (0.8−0.25)ln(0.8/0.25) = 1.3667
    // kl  = 0.2·ln(0.2/0.75) + 0.8·ln(0.8/0.25)             = 0.6662
    // ks  = max(|0·2−2·3|, |3·2−2·3|)/(2·3)                 = 1.0
    val ref = Seq(1L, 1L).toDF("v")
    val cur = Seq(9L, 9L, 9L).toDF("v")
    val r = Drift.binnedDrift(ref, cur, "v", 0L, 9L, bins = 2).head()
    assert(r.getAs[Long]("n_ref") === 2L && r.getAs[Long]("n_cur") === 3L)
    assert(r.getAs[Double]("psi") === 1.3667)
    assert(r.getAs[Double]("kl") === 0.6662)
    assert(r.getAs[Double]("ks") === 1.0)
    assert(r.getAs[Boolean]("drifted"))
  }

  test("out-of-grid values clamp into the edge bins") {
    val d = Seq(-100L, -1L, 0L, 9L, 10L, 999L).toDF("v")
    val bins = d.select(Drift.bin("v", 0L, 9L, 2).as("b"))
      .as[Long].collect().toSeq
    assert(bins === Seq(0L, 0L, 0L, 1L, 1L, 1L))
  }

  test("report is insensitive to which side misses bins entirely") {
    // cur empty in bin0 and ref empty in bin1: the full-outer align
    // must zero-fill BOTH directions (coalesce on each side)
    val ref = Seq(0L).toDF("v")
    val cur = Seq(9L).toDF("v")
    val r = Drift.binnedDrift(ref, cur, "v", 0L, 9L, bins = 2).head()
    // p = (2/3, 1/3), q = (1/3, 2/3): symmetric → psi has two equal
    // terms: 2 · (1/3)·ln2 = 0.4621; kl = (1/3)ln(1/2)+(2/3)ln2 = 0.2310
    assert(r.getAs[Double]("psi") === 0.4621)
    assert(r.getAs[Double]("kl") === 0.2310)
    assert(r.getAs[Double]("ks") === 1.0)
  }
}
