package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Bloom prefilter must be a pure optimization: for EVERY fpp the
  * result is column-equal to the plain left-anti join. The saturation
  * case (expected items far under-sized + high fpp → nearly every row
  * Bloom-positive) forces the false-positive path through the exact
  * confirm join; the generous case exercises the definitely-new bypass.
  */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val shard = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "alpha"),
    (5L, "delta"), (6L, "epsilon"), (7L, null.asInstanceOf[String]))
    .toDF("id", "text")
  private lazy val prior = Seq(
    (100L, "alpha"), (101L, "zeta"), (102L, "beta"))
    .toDF("id", "text")

  private def expected = shard
    .join(prior.select(md5(col("text")).as("__k")),
      md5(shard("text")) === col("__k"), "left_anti")
    .select("id").as[Long].collect().toSet

  test("bloom-prefiltered result equals the plain anti-join " +
    "(well-sized filter: bypass path carries the new rows)") {
    val got = IncrementalDedup
      .newRows(shard, prior, md5(col("text")),
        expectedPriorItems = 100, fpp = 0.01)
      .select("id").as[Long].collect().toSet
    assert(got === expected)
    assert(got === Set(3L, 5L, 6L, 7L)) // gamma, delta, epsilon, null
  }

  test("the membership probe is the native codegen'd expression inside " +
    "a whole-stage-codegen span, not a UDF") {
    // over parquet (an in-memory relation pre-folds its filters into
    // the LocalTableScan, leaving nothing to audit)
    val d = graft.Tables.load(spark, sf, "documents")
    val out = IncrementalDedup.newRows(
      d, d.where(col("doc_id") % 5 =!= 0), md5(col("text")),
      expectedPriorItems = 500)
    // materialize THIS dataset's own queryExecution (count() would
    // spawn a fresh one) so AQE finalizes and codegen stages exist
    out.collect()
    val planStr = out.queryExecution.executedPlan.toString
    // a codegen'd node renders as "*(n) Filter ..." in the final plan;
    // a UDF would plan a non-starred Filter (or a BatchEvalPython)
    val probeInCodegen =
      """\*\(\d+\) Filter [^\n]*bloom_might_contain""".r
        .findFirstIn(planStr).nonEmpty
    assert(probeInCodegen,
      s"bloom probe not inside WholeStageCodegen:\n$planStr")
  }

  test("saturated bloom (every row a false positive) still yields the " +
    "exact result via the confirm join") {
    val got = IncrementalDedup
      .newRows(shard, prior, md5(col("text")),
        expectedPriorItems = 1, fpp = 0.5)
      .select("id").as[Long].collect().toSet
    assert(got === expected,
      "false positives must be absorbed by the exact anti-join")
  }

  test("empty prior keeps the whole shard; shard-equals-prior keeps " +
    "nothing (but null keys, which match nothing, survive)") {
    val all = IncrementalDedup
      .newRows(shard, prior.limit(0), md5(col("text")), 1)
      .count()
    assert(all === shard.count())
    val none = IncrementalDedup
      .newRows(shard, shard, md5(col("text")), 10)
      .select("id").as[Long].collect().toSet
    assert(none === Set(7L), "null key never matches prior → stays new")
  }
}
