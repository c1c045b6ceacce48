package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}

/** Connected components over a GROUP-MEMBERSHIP table — the clustering
  * step every large-scale dedup pipeline runs after LSH: docs sharing
  * any band bucket form an edge, components are dup clusters, and the
  * min node id of each component is its canonical representative.
  *
  * The input is the bipartite (node, group) membership relation, NOT a
  * pairwise edge list: a bucket of k near-identical docs contributes k
  * membership rows here versus k^2/2 pairwise edges — at 100 TB a
  * single hot bucket would otherwise quadratically dominate the edge
  * materialization. Label propagation runs THROUGH the group nodes
  * (the "hub" trick): each round takes min(component) per group, then
  * min over a node's groups, so every step is a hash-shuffle groupBy —
  * no joins wider than the membership table itself.
  *
  * Rounds needed = the bipartite graph's diameter in node->group->node
  * hops (tiny for dedup clusters); `localCheckpoint` truncates lineage
  * each round. SIZE-GATED HYBRID like GraphClosure: below
  * `localMembershipThreshold` rows the components run as driver-side
  * union-find — identical result, one job; past the gate the iterative
  * path runs unchanged, so 100 TB inputs never collect. The 1 M
  * default is the measured crossover (local[8], 4-node clusters,
  * min-of-2 runs: local / distributed = 1.9 s / 4.4 s at 500 k rows,
  * 3.7 s / 3.6 s at 1 M, 8.0 s / 5.8 s at 2 M, 17.4 s / 10.2 s at
  * 4 M) — beyond it the collect costs more wall-clock than the
  * shuffles it avoids, on top of the driver-heap bite.
  *
  * Reference analog: the compound dedup-merge fixpoint
  * (/root/reference/minedatabase/pickaxe.py:533-556) unions duplicate
  * products under one id; this generalizes it to transitive near-dup
  * clusters.
  */
object ConnectedComponents {

  /** @param membership (nodeCol, groupCol) rows; two nodes are
    *                   connected iff they share at least one group
    * @return (nodeCol, component) — one row per distinct node;
    *         component = MIN node id over the node's component
    */
  def byGroup(
      membership: DataFrame,
      nodeCol: String,
      groupCol: String,
      maxIter: Int = 50,
      localMembershipThreshold: Long = 1_000_000L): DataFrame = {
    // Null rows are dropped up front: a null GROUP key is "no
    // membership" (the distributed path's equi-joins would drop it
    // anyway, while the local HashMap would have glued all null-group
    // nodes into one bogus component), and a null NODE id is not an
    // identifiable node at all. Dropping both makes the local and
    // distributed paths agree exactly; callers wanting null-keyed rows
    // back join the output with "left" (see q_dedup_survivors).
    // raw (pre-distinct) rows are cached and counted for the size gate:
    // union-find absorbs duplicate membership rows natively, so the
    // local path never pays a distinct shuffle; only the iterative path
    // dedups (below), where repeated rows would inflate every join.
    val m0 = membership.select(nodeCol, groupCol)
      .where(col(nodeCol).isNotNull && col(groupCol).isNotNull)
      .persist()
    try {
      val nRows = m0.count() // also materializes the persist
      if (nRows <= localMembershipThreshold)
        return localComponents(m0, nodeCol, groupCol)
      val m = m0.distinct()
      var lab = m.select(nodeCol).distinct()
        .withColumn("component", col(nodeCol))
        .localCheckpoint()
      var iter = 0
      var done = false
      while (!done && iter < maxIter) {
        iter += 1
        val gmin = m.join(lab, Seq(nodeCol))
          .groupBy(groupCol).agg(min("component").as("gmin"))
        val cand = m.join(gmin, Seq(groupCol))
          .groupBy(nodeCol).agg(min("gmin").as("cand"))
        val joined = lab.join(cand, Seq(nodeCol), "left")
          .select(col(nodeCol), col("component"),
            least(col("component"), coalesce(col("cand"), col("component")))
              .as("component2"))
          .localCheckpoint()
        done = joined.where(col("component2") < col("component")).isEmpty
        lab = joined.select(col(nodeCol), col("component2").as("component"))
      }
      // unconverged labels silently split real components — for a
      // dedup gate that is a wrong answer, not a degraded one: fail
      if (!done) sys.error(
        s"byGroup: iteration budget maxIter=$maxIter exhausted before " +
          "fixpoint — labels would split real components; raise maxIter " +
          "(rounds needed = the membership graph's node-group diameter)")
      lab
    } finally m0.unpersist()
  }

  /** Driver-side union-find for the small-input gate: identical
    * components and the same min-id canonical labels (union by the
    * node type's natural order, matching Spark's min()).
    */
  private def localComponents(
      m: DataFrame, nodeCol: String, groupCol: String): DataFrame = {
    import scala.collection.mutable
    val spark = m.sparkSession
    val ord: Ordering[Any] = m.schema(nodeCol).dataType match {
      case LongType    => Ordering.by(_.asInstanceOf[Long])
      case IntegerType => Ordering.by(_.asInstanceOf[Int])
      case ShortType   => Ordering.by(_.asInstanceOf[Short])
      case ByteType    => Ordering.by(_.asInstanceOf[Byte])
      case DoubleType  => Ordering.by(_.asInstanceOf[Double])
      case FloatType   => Ordering.by(_.asInstanceOf[Float])
      case StringType  => Ordering.by(_.asInstanceOf[String])
      case other => throw new IllegalArgumentException(
        s"byGroup node column must be orderable scalar, got $other")
    }
    val rows = m.collect().map(r => (r.get(0), r.get(1)))
    // caller's try/finally owns the unpersist
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(a: Any, b: Any): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val groupFirst = mutable.HashMap.empty[Any, Any]
    rows.foreach { case (node, grp) =>
      parent.getOrElseUpdate(node, node)
      groupFirst.get(grp) match {
        case Some(first) => union(first, node)
        case None        => groupFirst(grp) = node
      }
    }
    val nodeField = m.schema.find(_.name == nodeCol).get
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val out = parent.keys.toSeq.map(n => Row(n, find(n)))
    // Slice count tracks the RESULT SIZE, capped at the session's
    // parallelism: a fixture-scale component table sliced 32 ways fed
    // every consumer a 32-task stage whose per-task overhead dwarfed
    // the rows (profiled: 8-12 s summed task time per consumer at
    // local[32] for ~5 k rows — guide §2.6/§7.3 width tax), while a
    // 1-partition result would serialize a genuinely large one. ~4 k
    // rows per slice keeps small outputs narrow and the ≤1 M-node
    // gate means the cap is what binds at scale.
    val slices = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      (out.size + 4095L) / 4096L)).toInt
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, slices),
      StructType(Seq(nodeField, StructField("component",
        nodeField.dataType, nodeField.nullable))))
  }
}
