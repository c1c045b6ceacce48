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
      // the production query's own scorer — this spec must rank by
      // exactly what q_text_domain_cap ranks by, or it pins nothing
      .withColumn("q", TextOps.qualityScore("text"))
      .where(col("q").isNotNull)
      .localCheckpoint()

    val winKept = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("q").desc, col("doc_id"))))
      .where(col("rk") <= 10)
      .select("source", "doc_id")
      .as[(String, Long)].collect().toSet

    // the aggregator ranks (value desc, id asc) on Longs: quality is
    // scaled to 1e12 integers. That quantization is COARSER than
    // double resolution, so the parity's real precondition is that
    // distinct scores in one source differ by more than 1e-12 — true
    // here by a wide margin (the blend is a short rational chain over
    // token counts; sub-1e-12 gaps would need ~1e6-token docs), and a
    // violation fails this assert loudly rather than passing silently
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
