package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative transitive closure over a bipartite graph — the reference's
  * `find_minimal_set` reverse BFS (/root/reference/minedatabase/pickaxe.py:
  * 995-1044, SURVEY §2.7 D4): from a seed set of A-side nodes, repeatedly
  * add every B-side node adjacent to the frontier and every A-side node
  * adjacent to those B nodes, until fixpoint.
  *
  * Each iteration is two semi-joins + a distinct — all equality-based
  * shuffles on the node id, no driver-side adjacency. `localCheckpoint`
  * truncates lineage every few rounds so plans stay flat on deep graphs.
  */
object GraphClosure {

  /** @param edges   two-column DataFrame of (aCol, bCol) adjacency
    * @param seeds   DataFrame containing column `aCol` (the initial A set)
    * @return (reachable A nodes, reachable B nodes), each a one-column
    *         distinct DataFrame
    */
  def bipartiteClosure(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      seeds: DataFrame,
      maxIter: Int = 50,
      checkpointEvery: Int = 3): (DataFrame, DataFrame) = {
    val e = edges.select(aCol, bCol).distinct().persist()
    var visitedA = seeds.select(aCol).distinct().localCheckpoint()
    var visitedB = e.sparkSession.createDataFrame(
      e.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      e.select(bCol).schema)
    var frontierA = visitedA
    var iter = 0
    var done = false
    val toUnpersist = scala.collection.mutable.ListBuffer.empty[DataFrame]
    while (!done && iter < maxIter) {
      iter += 1
      val newB = e.join(frontierA, Seq(aCol), "left_semi")
        .select(bCol).distinct()
        .join(visitedB, Seq(bCol), "left_anti")
      val newBMat =
        if (iter % checkpointEvery == 0) newB.localCheckpoint()
        else { val p = newB.persist(); toUnpersist += p; p }
      if (newBMat.isEmpty) done = true
      else {
        visitedB = visitedB.union(newBMat).distinct().localCheckpoint()
        val newA = e.join(newBMat, Seq(bCol), "left_semi")
          .select(aCol).distinct()
          .join(visitedA, Seq(aCol), "left_anti")
          .localCheckpoint()
        // newBMat's consumers (visitedB, newA) are materialized checkpoints
        // now — release the cached blocks instead of letting them pile up.
        toUnpersist.foreach(_.unpersist())
        toUnpersist.clear()
        if (newA.isEmpty) done = true
        else {
          visitedA = visitedA.union(newA).distinct().localCheckpoint()
          frontierA = newA
        }
      }
    }
    toUnpersist.foreach(_.unpersist())
    e.unpersist()
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"bipartiteClosure: iteration budget maxIter=$maxIter exhausted " +
          "before fixpoint — result is a TRUNCATED closure (reference " +
          "semantics run BFS to fixpoint; raise maxIter).")
    (visitedA, visitedB)
  }
}
