package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** exactQuantile pinned against the sorted definition for several p,
  * including duplicate-heavy and single-bin-degenerate inputs.
  */
class ExactQuantileSpec extends SparkSuite {
  import spark.implicits._

  private def kth(sorted: Seq[Long], pNum: Long, pDen: Long): Long = {
    val n = sorted.size.toLong
    val k = (pNum * n + pDen - 1) / pDen
    sorted((k - 1).toInt)
  }

  test("matches the sorted definition on a real column for several p") {
    val part = graft.Tables.load(spark, sf, "part")
      .select(expr("cast(round(p_retailprice * 100) as long)").as("v"))
    val sorted = part.as[Long].collect().sorted.toSeq
    for ((pn, pd) <- Seq((1L, 100L), (1L, 4L), (1L, 2L), (3L, 4L),
      (9L, 10L), (1L, 1L))) {
      val got = Quantiles.exactQuantile(part, "v", pn, pd)
        .as[Long].head()
      assert(got === kth(sorted, pn, pd), s"p=$pn/$pd")
    }
  }

  test("duplicate-heavy and single-bin inputs stay exact") {
    // all mass in one bin (constant-ish values) + heavy duplicates
    val dup = (1 to 1000).map(i => (i % 7).toLong).toDF("v")
    val sorted = dup.as[Long].collect().sorted.toSeq
    for ((pn, pd) <- Seq((1L, 2L), (9L, 10L)))
      assert(Quantiles.exactQuantile(dup, "v", pn, pd).as[Long].head()
        === kth(sorted, pn, pd))
    // negative values exercise the (v - mn) shift
    val neg = Seq(-50L, -1L, 0L, 3L, 9L, -50L).toDF("v")
    assert(Quantiles.exactQuantile(neg, "v", 1, 2).as[Long].head()
      === kth(neg.as[Long].collect().sorted.toSeq, 1, 2))
  }
}
