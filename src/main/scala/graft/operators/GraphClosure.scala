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
  *
  * SIZE-GATED HYBRID: a multi-round distributed BFS costs dozens of Spark
  * jobs of fixed overhead; on a small graph that overhead dominates by
  * orders of magnitude. When the (deduped) edge set fits comfortably on
  * the driver (`localEdgeThreshold`, default 4M edges) the closure runs
  * as an in-memory BFS over a collected adjacency list — identical
  * result, one job. Past the gate the iterative semi-join path runs
  * unchanged, so 100 TB inputs never collect.
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
      localEdgeThreshold: Long = 4_000_000L): (DataFrame, DataFrame) = {
    // RAW rows are cached and counted for the size gate (the
    // ConnectedComponents.byGroup discipline): the driver-side BFS
    // absorbs duplicate edges natively, so the local path never pays
    // the distinct's shuffle — which, under the persist's static
    // width, was the most expensive stage of the whole closure at
    // fixture scale (profiled 3.8 s task time / 32 tasks on
    // q_graph_closure). Only the iterative path dedups, where repeated
    // rows would inflate every join. Raw count >= distinct count, so
    // the gate errs toward the scale-safe distributed path.
    val e0 = edges.select(aCol, bCol).persist()
    val nEdges = e0.count() // also materializes the persist
    if (nEdges <= localEdgeThreshold)
      return localClosure(e0, aCol, bCol, seeds)
    val e = e0.distinct()
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
      .localCheckpoint() // materialize before releasing the raw cache
    e0.unpersist()
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"bipartiteClosure: iteration budget maxIter=$maxIter exhausted " +
          "before fixpoint — result is a TRUNCATED closure (reference " +
          "semantics run BFS to fixpoint; raise maxIter).")
    (visitedA, visitedB)
  }

  /** Driver-side BFS for the small-graph gate: one collect, identical
    * fixpoint semantics to the iterative path (seeds are retained even
    * when absent from the edge set; B = everything adjacent to visited A).
    */
  private def localClosure(
      e: DataFrame,
      aCol: String,
      bCol: String,
      seeds: DataFrame): (DataFrame, DataFrame) = {
    import scala.collection.mutable
    val spark = e.sparkSession
    val edgePairs = e.collect().map(r => (r.get(0), r.get(1)))
    val seedVals = seeds.select(aCol).distinct().collect().map(_.get(0))
    e.unpersist()
    val aToB = mutable.HashMap.empty[Any, mutable.ArrayBuffer[Any]]
    val bToA = mutable.HashMap.empty[Any, mutable.ArrayBuffer[Any]]
    edgePairs.foreach { case (a, b) =>
      aToB.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      bToA.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    val visitedA = mutable.LinkedHashSet[Any](seedVals.toIndexedSeq: _*)
    val visitedB = mutable.LinkedHashSet.empty[Any]
    val queue = mutable.Queue[Any](seedVals.toIndexedSeq: _*)
    while (queue.nonEmpty) {
      val a = queue.dequeue()
      aToB.getOrElse(a, Nil).foreach { b =>
        if (visitedB.add(b))
          bToA.getOrElse(b, Nil).foreach { a2 =>
            if (visitedA.add(a2)) queue.enqueue(a2)
          }
      }
    }
    val aField = e.schema.find(_.name == aCol).get
    val bField = e.schema.find(_.name == bCol).get
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    def mk(vals: Iterable[Any], f: org.apache.spark.sql.types.StructField) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(vals.toSeq.map(Row(_)), 1),
        StructType(Seq(f)))
    (mk(visitedA, aField), mk(visitedB, bField))
  }
}
