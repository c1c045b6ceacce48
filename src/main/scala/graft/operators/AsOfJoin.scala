package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right timestamp `<=` the left
  * timestamp within the same key (the ε-merge family of the reference's
  * spectra matching, SURVEY §2.4 J10, generalized to time series).
  *
  * Implemented as a single union + one window pass instead of a per-row
  * lookup or a non-equi join: both sides are tagged, unioned, and sorted by
  * `(key, ts, side)` (right rows sort before left rows at equal ts so ties
  * match), then `last(right_ts, ignoreNulls)` over an unbounded-preceding
  * running frame carries the most recent right timestamp forward. One
  * shuffle on `key`, no nested loop — linear at any scale and skew-safe
  * under AQE.
  */
object AsOfJoin {

  /** Returns `left` plus a `__matched_ts` column (null when no right row
    * precedes it). `left` and `right` must both contain `keyCol` and
    * `tsCol`.
    */
  def asOfLatest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__row", struct(leftCols.toIndexedSeq.map(col): _*))
      .select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
        lit(1).as("__side"), lit(null).cast(left.schema(tsCol).dataType).as("__rts"),
        col("__row"))
    val r = right
      .select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
        lit(0).as("__side"), col(tsCol).as("__rts"),
        lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window
      .partitionBy("__key")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__matched_ts", last("__rts", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(c => col(s"__row.$c")) :+
        col("__matched_ts"): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right timestamp
    * `>=` the left timestamp within the same key — the time-to-next-
    * event direction ([[asOfLatest]] mirrored). Same union + one
    * window pass: rights sort AFTER lefts at equal ts (side 2 vs 1)
    * so an equal-timestamp right row is a valid forward match, and
    * `first(right_ts, ignoreNulls)` over a current-row→unbounded-
    * following frame carries the next right timestamp backward. One
    * shuffle on `key`, linear at any scale.
    */
  def asOfNext(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__row", struct(leftCols.toIndexedSeq.map(col): _*))
      .select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(left.schema(tsCol).dataType).as("__rts"),
        col("__row"))
    val r = right
      .select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
        lit(2).as("__side"), col(tsCol).as("__rts"),
        lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window
      .partitionBy("__key")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__matched_ts", first("__rts", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(c => col(s"__row.$c")) :+
        col("__matched_ts"): _*)
  }
}
