package graft.plans

import org.apache.spark.sql.SparkSession

import graft.SparkSuite

/** Pins the opt-in interval-join optimizer rule end to end on a live
  * session built through `withExtensions` (the production
  * `spark.sql.extensions=graft.GraftExtensions` route): with the
  * bucket-width conf set, a plain non-equi interval join must plan as
  * a HASH join (no BroadcastNestedLoopJoin, no CartesianProduct) and
  * return exactly the rows the un-rewritten plan returns; with the
  * conf unset the rule must keep its hands off.
  */
class RangeJoinRewriteSpec extends SparkSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-rangejoin-ext")
        .withExtensions(ext => new graft.GraftExtensions().apply(ext))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try f(s2)
      finally {
        SparkSession.setDefaultSession(spark)
        SparkSession.setActiveSession(spark)
      }
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  // facts 0..999 against 200 ranges of width ~7, plus empty and
  // boundary ranges: every answer row is boundary-sensitive
  private def fixtures(s: SparkSession) = {
    import s.implicits._
    val facts = (0 until 1000).map(i => (i.toLong, i * 1.0))
      .toDF("fact_id", "v")
    val ranges = (0 until 200).map { i =>
      (i.toLong, i * 4.9, i * 4.9 + 7.0)
    }.toDF("range_id", "lo", "hi")
    (facts, ranges)
  }

  private def intervalJoin(s: SparkSession) = {
    val (facts, ranges) = fixtures(s)
    facts.join(ranges,
      facts("v") > ranges("lo") && facts("v") < ranges("hi"))
      .select("fact_id", "range_id")
  }

  test("with bucketWidth set, the interval join plans as a hash join " +
    "and returns the identical rows") {
    withExtSession { s2 =>
      val baseline = intervalJoin(s2).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(baseline.nonEmpty)
      val basePlan = intervalJoin(s2)
        .queryExecution.executedPlan.toString
      assert(basePlan.contains("BroadcastNestedLoopJoin"),
        "fixture no longer plans BNLJ without the rule:\n" + basePlan)

      s2.conf.set(RangeJoinRewrite.widthKey, "7.0")
      try {
        val df = intervalJoin(s2)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          "rule did not rewrite the interval join:\n" + plan)
        assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
          "rewritten join is not a hash/merge join:\n" + plan)
        val got = df.collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got === baseline)
      } finally s2.conf.unset(RangeJoinRewrite.widthKey)
    }
  }

  test("inclusive bounds and the mirrored side order also rewrite " +
    "exactly") {
    withExtSession { s2 =>
      val (facts, ranges) = fixtures(s2)
      def q = ranges.join(facts, // range side on the LEFT
        facts("v") >= ranges("lo") && ranges("hi") >= facts("v"))
        .select("fact_id", "range_id")
      val baseline = q.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      s2.conf.set(RangeJoinRewrite.widthKey, "7.0")
      try {
        val plan = q.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
        val got = q.collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got === baseline)
      } finally s2.conf.unset(RangeJoinRewrite.widthKey)
    }
  }

  test("joins that already carry an equi key are left alone") {
    withExtSession { s2 =>
      import s2.implicits._
      val a = Seq((1L, 5.0), (2L, 9.0)).toDF("k", "v")
      val b = Seq((1L, 0.0, 10.0), (2L, 6.0, 7.0)).toDF("k", "lo", "hi")
      s2.conf.set(RangeJoinRewrite.widthKey, "5.0")
      try {
        val df = a.join(b, a("k") === b("k") &&
          a("v") > b("lo") && a("v") < b("hi"))
          .select(a("k"))
        val plan = df.queryExecution.optimizedPlan.toString
        assert(!plan.contains("__graft_bucket"),
          "rule rewrote an equi join:\n" + plan)
        assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L))
      } finally s2.conf.unset(RangeJoinRewrite.widthKey)
    }
  }
}
