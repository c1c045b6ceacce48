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
      maxIter: Int = 50): (DataFrame, DataFrame) = {
    val e = edges.select(aCol, bCol).distinct().persist()
    var visitedA = seeds.select(aCol).distinct().localCheckpoint()
    var frontierA = visitedA
    var iter = 0
    var done = false
    // loop on the A side only (one two-hop expansion per iteration:
    // frontier -> adjacent B -> adjacent A); the reachable B set equals
    // "B adjacent to reachable A" and is derived once at the end —
    // 2 materializations per iteration instead of 4
    while (!done && iter < maxIter) {
      iter += 1
      val reachedB = e.join(frontierA, Seq(aCol), "left_semi")
        .select(bCol).distinct()
      val newA = e.join(reachedB, Seq(bCol), "left_semi")
        .select(aCol).distinct()
        .join(visitedA, Seq(aCol), "left_anti")
        .localCheckpoint()
      if (newA.isEmpty) done = true
      else {
        // newA is anti-joined against visitedA: the union is disjoint,
        // no distinct needed
        visitedA = visitedA.union(newA).localCheckpoint()
        frontierA = newA
      }
    }
    val visitedB = e.join(visitedA, Seq(aCol), "left_semi")
      .select(bCol).distinct()
      .localCheckpoint() // materialize before releasing e
    e.unpersist()
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"bipartiteClosure: iteration budget maxIter=$maxIter exhausted " +
          "before fixpoint — result is a TRUNCATED closure (reference " +
          "semantics run BFS to fixpoint; raise maxIter).")
    (visitedA, visitedB)
  }
}
