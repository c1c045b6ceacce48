package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (non-equi) join: `facts.value ∈ (ranges.lo, ranges.hi)`,
  * exclusive bounds — the mass/adduct window search shape of the reference
  * (/root/reference/minedatabase/metabolomics.py:211-236, SURVEY §2.4 J6).
  *
  * Naively Spark plans this as a BroadcastNestedLoopJoin: every fact row is
  * tested against every range. Fine for ≤10⁴ ranges, quadratic at scale.
  * `intervalJoin` instead buckets both sides by `floor(x / bucketWidth)` and
  * equi-joins on the bucket key before applying the exact range predicate:
  * each range expands to `ceil(width/bucketWidth)+1` bucket rows, each fact
  * to one, so the join is a plain shuffled/broadcast hash join that scales
  * linearly and survives a 100× fact-side scale-up.
  *
  * `bucketWidth` should be ≥ the typical range width (each range then lands
  * in ≤2 buckets).
  */
object RangeJoin {

  /** @param inclusive exclusive `(lo, hi)` when false (default); the
    *                   reference's mass windows are INCLUSIVE `[lo, hi]`
    *                   ($gte/$lte, metabolomics.py:226-227)
    */
  def intervalJoin(
      facts: DataFrame,
      ranges: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      inclusive: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = lit(bucketWidth)
    val rb = ranges.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(loCol) / b).cast("long"),
        floor(col(hiCol) / b).cast("long"))))
    val fb = facts.withColumn("__bucket", floor(col(valueCol) / b).cast("long"))
    val pred =
      if (inclusive) col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol)
      else col(valueCol) > col(loCol) && col(valueCol) < col(hiCol)
    fb.join(rb, Seq("__bucket"))
      .where(pred)
      .drop("__bucket")
  }
}
