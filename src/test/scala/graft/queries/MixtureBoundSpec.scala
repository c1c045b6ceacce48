package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins q_pipeline_mixture's take-until contract: a source's selected
  * tokens may exceed its budget, but only by (strictly less than) the
  * ONE doc that straddles the boundary — never by a second doc,
  * because every selected doc's exclusive running total started
  * strictly under budget. The scaladoc states the bound; this spec is
  * the proof obligation.
  */
class MixtureBoundSpec extends SparkSuite {

  test("take-until overshoot is bounded by the straddling doc " +
    "(synthetic exact case)") {
    import spark.implicits._
    // one source, fixed priority order, budget 10:
    // cum_before = 0, 5, 12, 15 -> selected pri 1,2 (cum_before < 10)
    // tokens = 12: over budget by 2 < straddler's 7
    val df = Seq(
      ("a", "p1", 5L), ("a", "p2", 7L), ("a", "p3", 3L),
      ("a", "p4", 9L)).toDF("source", "pri", "n_tok")
    val cum = graft.operators.PrefixSum
      .runningTotal(df, "source", "pri", "n_tok")
    val sel = cum.where(col("cum_before") < 10L)
      .orderBy("pri").collect()
    assert(sel.map(_.getAs[String]("pri")).toSeq == Seq("p1", "p2"))
    val tokens = sel.map(_.getAs[Long]("n_tok")).sum
    assert(tokens == 12L)        // over budget...
    assert(tokens - 7L < 10L)    // ...by less than the straddler alone
  }

  test("q_pipeline_mixture: every source's overshoot is under one " +
    "straddling doc") {
    // recompute the per-doc selection the query aggregates away, find
    // each source's straddler (max cum_before among selected), and
    // assert n_tokens - straddler < budget — the take-until bound.
    val out = graft.SparkEntry.queries("q_pipeline_mixture")(spark, sf)
      .collect().map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("budget"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens")))).toMap
    assert(out.nonEmpty)
    val toks = "filter(split(text, ' '), x -> x != '')"
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("source") =!= "src0")
      .select(col("doc_id"), col("source"),
        expr(s"cast(size($toks) as bigint)").as("n_tok"),
        concat(md5(col("doc_id").cast("string")),
          col("doc_id").cast("string")).as("pri"))
    val cum = graft.operators.PrefixSum
      .runningTotal(corpus, "source", "pri", "n_tok")
    val perSrc = cum.collect()
      .groupBy(_.getAs[String]("source"))
    out.foreach { case (src, (budget, nDocs, nTokens)) =>
      val selected = perSrc(src)
        .filter(_.getAs[Long]("cum_before") < budget)
      assert(selected.length == nDocs,
        s"$src: recomputed selection ${selected.length} != $nDocs")
      assert(selected.map(_.getAs[Long]("n_tok")).sum == nTokens)
      if (selected.nonEmpty) {
        val straddler = selected
          .maxBy(_.getAs[Long]("cum_before")).getAs[Long]("n_tok")
        assert(nTokens - straddler < budget,
          s"$src: tokens $nTokens exceed budget $budget by more " +
            s"than the straddling doc ($straddler)")
      }
    }
  }
}
