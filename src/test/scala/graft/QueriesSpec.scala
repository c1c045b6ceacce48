package graft

import graft.queries.Registry

/** Smoke: every registered query runs on sf0.001 and returns rows with the
  * expected non-empty schema. Oracle equality is checked by the driver (and
  * scripts/check.py) at sf0.01; here we pin a few cheap exact values.
  */
class QueriesSpec extends SparkSuite {

  for (q <- Registry.all) {
    test(s"${q.name} runs on sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q_agg_pricing_summary row count and grand total") {
    val df = SparkEntry.queries("q_agg_pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatuses
    val n = rows.map(_.getAs[Long]("count_order")).sum
    assert(n === Tables.load(spark, sf, "lineitem").count())
  }

  test("q_sample_weighted is deterministic") {
    val a = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
    val b = SparkEntry.queries("q_sample_weighted")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.length === 50)
  }
}
