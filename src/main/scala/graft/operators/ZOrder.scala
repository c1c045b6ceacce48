package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping.
  *
  * At 100 TB a parquet scan prunes row groups / files whose footer
  * min/max stats exclude the predicate. Sorting by ONE column gives
  * perfect stats on that column and useless stats on every other; a
  * Z-order sort interleaves the bits of two quantized dimensions so
  * every file covers a small RECTANGLE of the (d1, d2) space — a
  * selective predicate on EITHER dimension (or both) then overlaps few
  * files. This is the lakehouse `OPTIMIZE ZORDER BY` capability built
  * from Spark primitives: an integer-exact quantize + interleave
  * projection (codegen'd builtins only), then `repartitionByRange` on
  * the z-value so file boundaries follow the curve.
  *
  * Everything is integer arithmetic — quantization uses `div`, so the
  * z-values (and the driver-checkable query over them) are bit-identical
  * across engines and partition layouts.
  */
object ZOrder {

  /** Bits kept per dimension; two dims interleave into 2*Bits <= 62. */
  val Bits = 16

  /** Max grid cell: (1 << Bits) - 1. */
  val GridMax: Long = (1L << Bits) - 1

  /** Interleave two already-quantized grid positions (each in
    * [0, GridMax]): bit i of `d1` lands at 2i+1, bit i of `d2` at 2i.
    * The 32 single-bit terms are disjoint, so plain SUM equals
    * bitwise-OR — summation keeps the expression trivially portable to
    * the DuckDB oracle and stays inside whole-stage codegen.
    */
  def interleave(d1: Column, d2: Column): Column =
    (0 until Bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(d1, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(d2, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ + _)

  /** DuckDB twin of [[interleave]] over SQL fragments `d1`/`d2`. */
  def duckInterleave(d1: String, d2: String): String =
    (0 until Bits).flatMap { i =>
      Seq(
        s"((($d1 >> $i) & 1) << ${2 * i + 1})",
        s"((($d2 >> $i) & 1) << ${2 * i})")
    }.mkString("(", " + ", ")")

  /** Append an integer-exact z-value column over two long dimensions.
    *
    * Per-dimension min/max come from ONE tiny aggregate broadcast back
    * as a 1-row cross join (the pack's standard data-derived-constant
    * shape — no collect, no second pass over the data at scale beyond
    * the stats scan, which at 100 TB is a map-side-combined min/max).
    * Quantization is `((x - mn) * GridMax) div max(1, mx - mn)` — pure
    * integer, monotone per dimension, exact for |x| up to ~2^46 (the
    * product must fit a long).
    */
  def withZValue(
      df: DataFrame, d1: String, d2: String,
      zCol: String = "zval"): DataFrame = {
    Seq("__graft_zp", "__graft_zs").foreach(c =>
      require(!df.columns.contains(c), s"withZValue: $c is reserved"))
    val stats = df.agg(
      min(col(d1)).as("__graft_d1mn"), max(col(d1)).as("__graft_d1mx"),
      min(col(d2)).as("__graft_d2mn"), max(col(d2)).as("__graft_d2mx"))
    df.crossJoin(broadcast(stats))
      .withColumn("__graft_zp", expr(
        s"(($d1 - __graft_d1mn) * $GridMax) div " +
          s"greatest(1L, __graft_d1mx - __graft_d1mn)"))
      .withColumn("__graft_zs", expr(
        s"(($d2 - __graft_d2mn) * $GridMax) div " +
          s"greatest(1L, __graft_d2mx - __graft_d2mn)"))
      .withColumn(zCol, interleave(col("__graft_zp"), col("__graft_zs")))
      .drop("__graft_zp", "__graft_zs",
        "__graft_d1mn", "__graft_d1mx", "__graft_d2mn", "__graft_d2mx")
  }

  /** DuckDB twin of [[withZValue]]'s quantize step for dimension SQL
    * fragment `x` against min/max fragments.
    */
  def duckGrid(x: String, mn: String, mx: String): String =
    s"((($x - $mn) * $GridMax) // greatest(1, $mx - $mn))"

  /** Write `df` as `files` parquet files clustered along the z-curve of
    * (d1, d2): range-partition on the z-value (sampled range exchange —
    * scales to any input; no global sort barrier beyond the exchange),
    * sort within each file so row groups subdivide the curve too, drop
    * the helper column. Each output file's (d1, d2) footer stats then
    * cover a near-rectangle of the grid — the property ZOrderSpec
    * measures against a single-dimension sort.
    */
  def clusteredWrite(
      df: DataFrame, d1: String, d2: String, path: String,
      files: Int = 32): Unit = {
    withZValue(df, d1, d2)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)
  }
}
