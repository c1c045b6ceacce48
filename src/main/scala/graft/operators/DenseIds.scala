package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed dense rank 1..n in a total order — the scale-safe
  * replacement for `row_number() over (order by ...)`, which plans a
  * single-task global sort (every row through ONE window task: the W1
  * anti-pattern on a 100 TB table). Shape (same family as
  * [[PrefixSum]]):
  *
  *  1. range-partition by the order columns — globally sorted ACROSS
  *     partitions — sort within, freeze the layout with an eager
  *     localCheckpoint so both passes see identical partitions;
  *  2. count rows per partition (a partition-count-sized collect —
  *     bytes, regardless of table size) and prefix-sum the counts into
  *     per-partition start offsets on the driver;
  *  3. second pass adds offset + local position — no shuffle, no
  *     global sort task, every row touched exactly twice.
  *
  * The order must be TOTAL (tie-free) for the assignment to be
  * deterministic — same contract as the window form it replaces.
  *
  * Reference analog: assign_ids (pickaxe.py:1046-1102) hands out dense
  * export ids by iterating the whole compound dict on one process;
  * this is the distributed equivalent.
  */
object DenseIds {

  /** Append `outCol`: bigint 1..n in `order`. */
  def withDenseRank(
      df: DataFrame,
      order: Seq[Column],
      outCol: String = "__rank",
      numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "withDenseRank: empty order")
    require(!df.columns.contains(outCol),
      s"withDenseRank: input already has a $outCol column")
    val spark = df.sparkSession
    val base =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, order: _*)
      else df.repartitionByRange(order: _*)
    val ranged = base.sortWithinPartitions(order: _*)
      .localCheckpoint() // freeze layout: both passes see the same rows
    // phase 1: per-partition row counts -> start offsets
    val counts = ranged.rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)))
      .collect().toMap
    val nParts = ranged.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
      p += 1
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // phase 2: offset + local position, partition-local
    val outSchema = StructType(ranged.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val rdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = bc.value(pid)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
