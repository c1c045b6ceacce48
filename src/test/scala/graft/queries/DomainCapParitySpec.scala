package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.{TextOps, TopKAgg}

/** q_text_domain_cap documents the typed TopKAgg aggregator as its
  * mega-domain fallback (a window must co-locate and sort a whole
  * domain; the aggregator's partials carry at most k rows per map
  * task). This spec pins that the fallback SELECTS THE SAME DOCS:
  * the per-source kept set under TopKAgg (quality scaled to exact
  * 1e12 integers, doc-id tie-break) equals the window form's rk<=10
  * cut on the real documents table.
  */
class DomainCapParitySpec extends SparkSuite {

  import spark.implicits._

  test("TopKAgg quota fallback keeps exactly the window form's docs") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val scored = docs
      .withColumn("t", TextOps.tokens("text"))
      .where(expr("size(t) > 0"))
      .withColumn("q", expr(
        "0.4 * least(size(t) / 80.0, 1.0) " +
          "+ 0.4 * (size(array_distinct(t)) / size(t)) " +
          "+ 0.2 * (1.0 - size(filter(t, x -> " +
          "array_contains(array('the','a'), x))) / size(t))"))
      .localCheckpoint()

    val winKept = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("q").desc, col("doc_id"))))
      .where(col("rk") <= 10)
      .select("source", "doc_id")
      .as[(String, Long)].collect().toSet

    // the aggregator ranks (value desc, id asc) on Longs: scale the
    // quality chain to exact 1e12 integers — far below the double's
    // resolution on [0,1], so the ordering cannot flip — and negate
    // nothing (same direction as the window's q desc)
    val aggKept = scored
      .select(col("source"),
        expr("cast(round(q * 1000000000000) as long)").as("qi"),
        col("doc_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(TopKAgg(10).column)
      .flatMap { case (src, top) => top.map(t => (src, t._2)) }
      .collect().toSet

    assert(aggKept === winKept,
      s"fallback diverges: only-window=${winKept -- aggKept} " +
        s"only-agg=${aggKept -- winKept}")
    assert(winKept.nonEmpty)
  }
}
