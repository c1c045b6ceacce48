package graft.queries

import graft.SparkSuite

/** Pins the q_sim_ivfpq_rerank composition's value claim: at equal
  * nprobe, exact re-rank of the ADC top-10 shortlist never recalls
  * FEWER true neighbors than the plain ADC top-3. The dominance is
  * structural — a true top-3 neighbor that made the shortlist has at
  * most two corpus vectors ahead of it under the exact (dist, id)
  * order, so it survives exact ranking of ANY subset containing it —
  * and this spec is the proof obligation on real data.
  */
class RerankRecallSpec extends SparkSuite {

  test("rerank recall dominates the no-rerank path at equal nprobe") {
    val rows = graft.SparkEntry.queries("q_sim_recall_ivfpq")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val np2 = r.getAs[Long]("hits_np2")
      val rr = r.getAs[Long]("hits_rerank")
      assert(rr >= np2,
        s"query $qid: rerank recall $rr < no-rerank $np2 — the " +
          "shortlist/re-rank composition lost a neighbor ADC top-3 had")
    }
    // the audit must be non-trivial: at least one true neighbor
    // recovered somewhere, else the fixture proves nothing
    assert(rows.map(_.getAs[Long]("hits_rerank")).sum > 0)
  }
}
