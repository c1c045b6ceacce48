package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running totals — the two-phase scan that replaces a
  * per-group cumsum WINDOW at corpus scale. A window
  * `sum over (partition by g order by o)` shuffles every row of a
  * group to ONE task and sorts there: a hot group (one language ≈ half
  * a corpus) becomes a single-task straggler. The scan shape instead:
  *
  *  1. range-partition by (group, order) — globally sorted across
  *     partitions, groups span partition boundaries freely — and
  *     freeze the layout with an eager localCheckpoint so both passes
  *     see identical partitions;
  *  2. per-partition totals for the groups that can TOUCH a partition
  *     boundary — only each partition's first and last group, since
  *     range partitioning keeps a group's rows contiguous — collected
  *     to the driver: ≤ 2 rows per partition regardless of group
  *     cardinality (a billion-group input collects the same few KB);
  *  3. per-partition offsets = sum of the same group's totals in
  *     earlier partitions, broadcast back; a second pass adds local
  *     running sums to the offset.
  *
  * Every row is touched exactly twice, no per-group sort task, and the
  * driver state is proportional to partition count, not rows.
  *
  * Reference analog: generation-cumulative compound counts in the
  * expansion loop (pickaxe.py prints running totals per generation);
  * the training-data use is sequence packing (q_text_pack).
  */
object PrefixSum {

  /** Append `outCol`: the sum of `valueCol` over all EARLIER rows of
    * the same `groupCol` in (`orderCol` ascending) order — exclusive
    * prefix sum, 0 for each group's first row. `orderCol` must be
    * unique within a group (it is the total order); `valueCol` must be
    * a non-null bigint.
    */
  def runningTotal(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      valueCol: String,
      numPartitions: Int = 0,
      outCol: String = "cum_before"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"runningTotal: input already has a $outCol column")
    require(df.schema(valueCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"runningTotal: $valueCol must be bigint, got " +
        s"${df.schema(valueCol).dataType} (cast before calling — " +
        "getLong on another type fails row by row at runtime)")
    val spark = df.sparkSession
    val base =
      if (numPartitions > 0)
        df.repartitionByRange(numPartitions, col(groupCol), col(orderCol))
      else df.repartitionByRange(col(groupCol), col(orderCol))
    val ranged = base.sortWithinPartitions(groupCol, orderCol)
      .localCheckpoint() // freeze layout: both passes see the same rows
    val gi = ranged.schema.fieldIndex(groupCol)
    val vi = ranged.schema.fieldIndex(valueCol)
    // phase 1: totals for boundary-capable groups only. Rows arrive
    // sorted by (group, order), so a group interior to the partition
    // (neither its first nor its last group) cannot continue into a
    // neighbor — it needs no offset and is NOT collected: driver
    // state is <= 2 rows per partition at ANY group cardinality.
    val totals: Array[(Int, Any, Long)] = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          var firstG: Any = null
          var firstSum = 0L
          var curG: Any = null
          var curSum = 0L
          var started = false
          it.foreach { r =>
            val g = r.get(gi)
            if (r.isNullAt(vi))
              throw new IllegalArgumentException(
                s"runningTotal: null in value column $valueCol (contract: " +
                  "non-null bigint) — coalesce before calling")
            val v = r.getLong(vi)
            if (!started) {
              started = true; firstG = g; firstSum = v
              curG = g; curSum = v
            } else if (g == curG) {
              curSum += v
              if (g == firstG) firstSum += v
            } else {
              curG = g; curSum = v
            }
          }
          if (firstG == curG) Iterator((pid, firstG, firstSum))
          else Iterator((pid, firstG, firstSum), (pid, curG, curSum))
        }
      }.collect()
    // offsets: for (pid, g), the sum of g's totals in earlier pids
    val byGroup = totals.groupBy(_._2)
    val offset: Map[(Int, Any), Long] = totals.map { case (pid, g, _) =>
      (pid, g) -> byGroup(g).filter(_._1 < pid).map(_._3).sum
    }.toMap
    val bc = spark.sparkContext.broadcast(offset)
    // phase 2: local running sum + broadcast offset
    val outSchema = StructType(ranged.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val rdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val running = scala.collection.mutable.HashMap.empty[Any, Long]
      it.map { r =>
        val g = r.get(gi)
        if (r.isNullAt(vi))
          throw new IllegalArgumentException(
            s"runningTotal: null in value column $valueCol (contract: " +
              "non-null bigint) — coalesce before calling")
        val before =
          running.getOrElse(g, bc.value.getOrElse((pid, g), 0L))
        running(g) = before + r.getLong(vi)
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
